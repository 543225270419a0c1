package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repeated-passage detection — the span-level complement of doc-level
  * dedup, following the public exact-substring-dedup formulation of
  * Lee et al. ("Deduplicating Training Data Makes Language Models
  * Better", ACL 2022): a passage is suspect when the SAME token window
  * recurs across documents, even though the documents as wholes are
  * distinct (boilerplate, licenses, navigation chrome). Their suffix
  * array over the concatenated corpus doesn't distribute naturally;
  * the standard distributed approximation is fixed-width token
  * windows — a window of `w` tokens repeated across `minDocs`
  * documents witnesses a repeated substring of at least `w` tokens.
  *
  * Scale shape: window extraction is map-only (per-row lambda over the
  * token array, one output row per token position — same linear
  * explode as chunking/decontamination). Repetition counting shuffles
  * 16-byte (hash, doc) pairs — never gram STRINGS: windows travel as
  * `xxhash64` of the joined tokens, so shuffle width is independent of
  * `w` (a 64-bit collision needs ~2^32 distinct grams in one corpus;
  * at that scale switch the hash to a 128-bit pair before this
  * becomes thinkable). The rejoin is an equi-join on the hash, and
  * span coverage (distinct token positions under any repeated window)
  * is one more keyed aggregate — three shuffles total, all on narrow
  * rows, regardless of document width.
  */
object RepeatedSpans {

  /** Per-document repetition report: window counts, repeated-window
    * counts, and the fraction of token positions covered by at least
    * one cross-document repeated window. Documents shorter than `w`
    * tokens report zeros (nothing to witness). */
  def report(docs: DataFrame, w: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // stage tokens once (Filter+Project don't share subexpressions)
    val toks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
    // one hash per window start, 1-based to mirror SQL slice semantics
    val wins = toks
      .filter(col("__n") >= w)
      // hash each TOKEN once, then hash the w-slice of token hashes:
      // gram identity is unchanged (tokens are \\s+-split, so the old
      // space-joined string was injective on token sequences) but the
      // per-position work drops from an O(w)-char string build + string
      // hash to an 8-long slice + fixed-width hash — no allocation
      .withColumn("__th", transform(col("__t"), t => xxhash64(t)))
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), col("__n") - w + 1),
          i => xxhash64(slice(col("__th"), i, lit(w))))))
      .select(col(idCol), (col("pos") + 1).as("__start"), col("col").as("__gh"))
      // tokenize+hash ONCE: the window table anchors both the
      // repetition aggregate and the rejoin probe side — unpersisted,
      // the per-position slice/concat/xxhash Generate pass runs twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cross-document repetition: distinct-doc count per window hash
    val repeated = wins
      .groupBy("__gh")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__gh")
    val repWins = wins.join(repeated, Seq("__gh"))
    // coverage: distinct token positions under any repeated window
    val coverage = repWins
      .select(col(idCol), col("__start"),
        explode(sequence(col("__start"), col("__start") + w - 1)).as("__pos"))
      .groupBy(idCol)
      .agg(countDistinct(col("__pos")).as("covered_tokens"),
        countDistinct(col("__start")).as("n_repeated_windows"))
    toks.join(coverage, Seq(idCol), "left")
      .select(col(idCol),
        col("__n").cast("bigint").as("n_tokens"),
        greatest(col("__n") - w + 1, lit(0)).cast("bigint").as("n_windows"),
        coalesce(col("n_repeated_windows"), lit(0L)).as("n_repeated_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)) /
          greatest(col("__n"), lit(1)).cast("double"), 4)
          .as("repeated_fraction"))
      .orderBy(idCol)
  }

  /** Repeated-span EXCISION — act on what [[report]] measures: emit the
    * cleaned corpus with cross-document repeated passages removed,
    * keeping exactly one copy (Lee et al.'s dedup semantics, not just
    * their diagnosis). Rules:
    *
    *  - a window (w tokens) is repeated when it occurs in ≥ `minDocs`
    *    distinct docs;
    *  - each repeated gram elects ONE witness occurrence — the globally
    *    first by (doc, start) — which keeps its tokens (keep-one-copy);
    *  - a token position is excised iff it lies under a non-witness
    *    occurrence and under NO witness occurrence in its doc (witness
    *    spans are protected, so the kept copy is never mutilated by an
    *    overlapping occurrence of a different gram);
    *  - overlapping excised windows remove the union of their
    *    positions, never double-count;
    *  - surviving tokens re-join with single spaces (token-level
    *    reconstruction — the same whitespace normalization as every
    *    text operator here).
    *
    * Scale shape: identical to [[report]] (windows travel as 16-byte
    * hash rows) plus the witness aggregate (min-struct,
    * partial-aggregated) and ONE per-doc keyed aggregate resolving
    * witness-protected vs excised positions as a set difference —
    * position volume is w× the repeated subset only, and the per-doc
    * sets are bounded by document length, the same bound as chunking.
    *
    * Returns (id, n_tokens, n_removed, cleaned_text) for EVERY doc. */
  def excise(docs: DataFrame, w: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
    val wins = toks
      .filter(col("__n") >= w)
      // hash each TOKEN once, then hash the w-slice of token hashes:
      // gram identity is unchanged (tokens are \\s+-split, so the old
      // space-joined string was injective on token sequences) but the
      // per-position work drops from an O(w)-char string build + string
      // hash to an 8-long slice + fixed-width hash — no allocation
      .withColumn("__th", transform(col("__t"), t => xxhash64(t)))
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), col("__n") - w + 1),
          i => xxhash64(slice(col("__th"), i, lit(w))))))
      .select(col(idCol), (col("pos") + 1).as("__start"), col("col").as("__gh"))
      // tokenize+hash ONCE (same two-consumer shape as [[report]])
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // repeated grams, each with its keep-first witness occurrence
    // (min over (doc, start) structs — field order IS the ordering)
    val repeated = wins
      .groupBy("__gh")
      .agg(countDistinct(col(idCol)).as("__df"),
        min(struct(col(idCol).as("d"), col("__start").as("s"))).as("__wit"))
      .filter(col("__df") >= minDocs)
      .select(col("__gh"), col("__wit.d").as("__wit_doc"),
        col("__wit.s").as("__wit_start"))
    val occ = wins.join(repeated, Seq("__gh"))
      .withColumn("__is_wit",
        col(idCol) === col("__wit_doc") && col("__start") === col("__wit_start"))
    // per doc: witness-covered positions protect, nonwitness-covered
    // positions excise — one keyed aggregate (two conditional sets +
    // set difference), not a per-(doc, position) shuffle followed by a
    // per-doc one
    val removedPos = occ
      .select(col(idCol), col("__is_wit"),
        explode(sequence(col("__start"), col("__start") + w - 1)).as("__pos"))
      .groupBy(idCol)
      .agg(
        collect_set(when(!col("__is_wit"), col("__pos"))).as("__nwp"),
        collect_set(when(col("__is_wit"), col("__pos"))).as("__wp"))
      .select(col(idCol), array_except(col("__nwp"), col("__wp")).as("__rm"))
    toks.join(removedPos, Seq(idCol), "left")
      .withColumn("__rm", coalesce(col("__rm"), lit(Array.empty[Int])))
      .select(col(idCol),
        col("__n").cast("bigint").as("n_tokens"),
        size(col("__rm")).cast("bigint").as("n_removed"),
        concat_ws(" ", filter(col("__t"),
          (_, i) => !array_contains(col("__rm"), i + 1))).as("cleaned_text"))
      .orderBy(idCol)
  }
}
