package graft.lake

import scala.jdk.CollectionConverters._
import scala.language.existentials // parquet's Statistics[_ <: Comparable[_]]

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

/** File-level column statistics for data skipping — the metadata layer
  * that makes a 100 TB table readable: a predicate consults per-file
  * min/max from the table log and opens only the files whose range can
  * match, the same design as Iceberg/Delta file stats (reference
  * behavior: Athena partition/column pruning over the Glue catalog,
  * `athena/ddl.sql`).
  *
  * Stats come from parquet FOOTERS (row-group metadata already written
  * by every parquet writer) — collecting them reads zero data pages.
  * Collection here is a driver-side loop over a commit's files; a
  * commit writes O(shuffle partitions) files, so this is manifest-scale
  * work, not data-scale (on a real cluster the same footer reads would
  * be distributed over executors and returned with the task results).
  *
  * Conservative by construction: a column with no usable stats (missing
  * footer stats, truncated binary stats, unsupported physical type)
  * yields `None` bounds and the file is NEVER pruned on that column.
  * String bounds compare as Java strings, which matches parquet's
  * unsigned byte order for ASCII; non-ASCII corpora keep correctness
  * (pruning only widens to a full scan when bytes disagree with UTF-16
  * order is impossible — we prune only when BOTH bounds are present and
  * strictly exclude the interval, and parquet's truncated bounds are
  * themselves widened, so a kept-file superset is preserved).
  */
object TableStats {

  /** Typed bounds for one column of one file. `typ` is one of
    * long/double/string/bool/date (epoch-day long)/ts (epoch-micros
    * long). `min`/`max` are string-encoded in the `typ` domain; `None`
    * means "unknown — never prune". */
  final case class ColStats(typ: String, min: Option[String],
      max: Option[String], nulls: Long)

  /** Stats for one data file (path relative to the table root). */
  final case class FileStats(file: String, rows: Long,
      cols: Map[String, ColStats])

  // ---- footer collection ----

  private def tsToMicros(unit: TimeUnit, v: Long): Long = unit match {
    case TimeUnit.MILLIS => v * 1000L
    case TimeUnit.MICROS => v
    case TimeUnit.NANOS  => v / 1000L
  }

  /** Map one column chunk's statistics into the typed-string domain.
    * Returns None for unsupported shapes — the column then reports
    * unknown bounds for the whole file. */
  private def chunkBounds(pt: PrimitiveType,
      st: org.apache.parquet.column.statistics.Statistics[_])
      : Option[(String, String, String)] = {
    if (st == null || st.isEmpty || !st.hasNonNullValue) return None
    import PrimitiveType.PrimitiveTypeName._
    val ann = pt.getLogicalTypeAnnotation
    (pt.getPrimitiveTypeName, ann) match {
      case (INT32, d: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
        Some(("date",
          st.genericGetMin.asInstanceOf[Integer].toLong.toString,
          st.genericGetMax.asInstanceOf[Integer].toLong.toString))
      case (INT32, _) =>
        Some(("long",
          st.genericGetMin.asInstanceOf[Integer].toLong.toString,
          st.genericGetMax.asInstanceOf[Integer].toLong.toString))
      case (INT64, t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        Some(("ts",
          tsToMicros(t.getUnit, st.genericGetMin.asInstanceOf[Long]).toString,
          tsToMicros(t.getUnit, st.genericGetMax.asInstanceOf[Long]).toString))
      case (INT64, _) =>
        Some(("long",
          st.genericGetMin.asInstanceOf[Long].toString,
          st.genericGetMax.asInstanceOf[Long].toString))
      case (FLOAT, _) =>
        Some(("double",
          st.genericGetMin.asInstanceOf[Float].toDouble.toString,
          st.genericGetMax.asInstanceOf[Float].toDouble.toString))
      case (DOUBLE, _) =>
        Some(("double",
          st.genericGetMin.asInstanceOf[Double].toString,
          st.genericGetMax.asInstanceOf[Double].toString))
      case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) =>
        Some(("string",
          st.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8,
          st.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8))
      case (BOOLEAN, _) =>
        Some(("bool",
          (if (st.genericGetMin.asInstanceOf[Boolean]) 1 else 0).toString,
          (if (st.genericGetMax.asInstanceOf[Boolean]) 1 else 0).toString))
      case _ => None // INT96, decimals, fixed-len: unknown bounds
    }
  }

  /** Read footer stats for every parquet file under `absDir`.
    * `relPrefix` is the file path prefix relative to the table root
    * (e.g. `data/c00000003-ab12cd34`). */
  def collectDir(conf: Configuration, absDir: String, relPrefix: String)
      : Seq[FileStats] = {
    val dir = new Path(absDir)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
        try {
          val blocks = r.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          // aggregate across row groups; only flat (non-nested) columns
          val perCol = blocks.flatMap(_.getColumns.asScala)
            .filter(_.getPath.size == 1)
            .groupBy(_.getPath.toDotString)
          val cols = perCol.flatMap { case (name, chunks) =>
            val pt = chunks.head.getPrimitiveType
            val bounds = chunks.map(c => chunkBounds(pt, c.getStatistics))
            // -1 = unknown: a writer that doesn't set null counts must
            // not be read as "zero nulls" — pruning ignores this field,
            // but StatsAgg's exact metadata aggregates depend on the
            // distinction (unknown ⇒ that file falls back to a scan)
            val chunkNulls = chunks.map { c =>
              val st = c.getStatistics
              if (st != null && st.isNumNullsSet) st.getNumNulls else -1L
            }
            val nulls =
              if (chunkNulls.exists(_ < 0L)) -1L else chunkNulls.sum
            // any chunk without usable bounds ⇒ whole file unknown
            val merged: (Option[String], Option[String]) =
              if (bounds.exists(_.isEmpty)) (None, None)
              else {
                val bs = bounds.flatten
                val typ = bs.head._1
                val ord: Ordering[String] = typ match {
                  case "string" => Ordering.String
                  case "double" => Ordering.by[String, Double](_.toDouble)
                  case _        => Ordering.by[String, Long](_.toLong)
                }
                (Some(bs.map(_._2).min(ord)), Some(bs.map(_._3).max(ord)))
              }
            val typ = bounds.flatten.headOption.map(_._1)
            typ.map(t => name -> ColStats(t, merged._1, merged._2, nulls))
          }
          FileStats(s"$relPrefix/${s.getPath.getName}", rows, cols)
        } finally r.close()
      }
  }

  // ---- manifest encoding ----
  // One line per file:  #f<TAB>file<TAB>rows
  // One line per column: #c<TAB>file<TAB>col<TAB>typ<TAB>min<TAB>max<TAB>nulls
  // min/max: "" = unknown, "=" + URL-encoded value otherwise.

  private def enc(o: Option[String]): String =
    o.map(v => "=" + java.net.URLEncoder.encode(v, "UTF-8")).getOrElse("")
  private def dec(s: String): Option[String] =
    if (s.startsWith("=")) Some(java.net.URLDecoder.decode(s.drop(1), "UTF-8"))
    else None

  def toLines(stats: Seq[FileStats]): Seq[String] =
    stats.flatMap { f =>
      s"#f\t${f.file}\t${f.rows}" +:
        f.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
          s"#c\t${f.file}\t$c\t${cs.typ}\t${enc(cs.min)}\t${enc(cs.max)}\t${cs.nulls}"
        }
    }

  def fromLines(lines: Seq[String]): Seq[FileStats] = {
    val fRows = lines.filter(_.startsWith("#f\t")).map { l =>
      val p = l.split("\t", -1); p(1) -> p(2).toLong
    }
    val cRows = lines.filter(_.startsWith("#c\t")).map { l =>
      val p = l.split("\t", -1)
      (p(1), p(2), ColStats(p(3), dec(p(4)), dec(p(5)), p(6).toLong))
    }.groupBy(_._1)
    fRows.map { case (file, rows) =>
      FileStats(file, rows,
        cRows.getOrElse(file, Seq.empty).map(t => t._2 -> t._3).toMap)
    }
  }

  // ---- pruning ----

  /** Convert a user-space filter value into the stats string domain of
    * `typ`. Unsupported combinations return None (⇒ no pruning). */
  private[lake] def toDomain(typ: String, v: Any): Option[String] =
    (typ, v) match {
      case ("long", n: Number) => Some(n.longValue.toString)
      case ("double", n: Number) => Some(n.doubleValue.toString)
      case ("string", s: String) => Some(s)
      case ("date", d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toString)
      case ("date", d: java.time.LocalDate) => Some(d.toEpochDay.toString)
      case ("ts", t: java.sql.Timestamp) =>
        Some((t.getTime * 1000L + (t.getNanos / 1000L) % 1000L).toString)
      case ("ts", i: java.time.Instant) =>
        Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
      case ("bool", b: Boolean) => Some(if (b) "1" else "0")
      case _ => None
    }

  private[lake] def cmp(typ: String, a: String, b: String): Int = typ match {
    case "string" => a.compareTo(b)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _        => java.lang.Long.compare(a.toLong, b.toLong)
  }

  /** True iff the file MIGHT contain a row with `col` in [lo, hi] —
    * i.e. its [min, max] intersects the query interval, or its bounds
    * are unknown. Unknown columns/types always keep the file. */
  def mightMatch(f: FileStats, colName: String, lo: Any, hi: Any): Boolean =
    f.cols.get(colName) match {
      case Some(cs) =>
        val keep = for {
          mn <- cs.min; mx <- cs.max
          l <- toDomain(cs.typ, lo); h <- toDomain(cs.typ, hi)
        } yield cmp(cs.typ, mx, l) >= 0 && cmp(cs.typ, mn, h) <= 0
        keep.getOrElse(true)
      case None => true
    }
}
