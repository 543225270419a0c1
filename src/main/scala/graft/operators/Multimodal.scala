package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual media decode is STUBBED (this environment has no image /
  * audio libraries): `FakeDecoder` produces a deterministic feature
  * vector from the bytes. Everything around it — schema, batch shape,
  * partition sizing, the `mapPartitions` boundary where a real decoder
  * (JNI/ffmpeg/JCodec) would slot in — is real and tested. At scale the
  * binary payloads dominate partition size, so callers should set
  * `spark.sql.files.maxPartitionBytes` for the payload, not the row
  * count, and the decode runs embarrassingly parallel with no shuffle.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      mime: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Double])

  /** Pluggable decode step — a real implementation would decode pixels /
    * samples here. Must be deterministic for a given payload. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB decoder: deterministic pseudo-features derived from a rolling
    * hash of the payload bytes. Stands in for "decode + embed" so the
    * distributed plumbing is exercised end-to-end. */
  object FakeDecoder extends Decoder {
    private val Dim = 8
    def decode(row: MediaRow): MediaFeatures = {
      var h = 1125899906842597L
      val feats = new Array[Double](Dim)
      var i = 0
      while (i < row.payload.length) {
        h = 31 * h + (row.payload(i) & 0xff)
        feats(i % Dim) += (row.payload(i) & 0xff) / 255.0
        i += 1
      }
      MediaFeatures(row.media_id, row.mime, row.payload.length.toLong, h, feats)
    }
  }

  /** Batched per-partition featurize — the `mapPartitions` boundary a
    * native decoder would live behind. No shuffle: feature extraction is
    * map-only; the iterator keeps memory at one batch, not one
    * partition. */
  def featurize(media: Dataset[MediaRow], decoder: Decoder = FakeDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would amortize codec init over the batch here
        batch.iterator.map(decoder.decode)
      }
    }
  }

  /** Real media ingestion path: Spark's `binaryFile` source reads files
    * as (path, modificationTime, length, content) rows — the way image/
    * audio/video assets actually enter a 100 TB pipeline. Partitioning
    * is by file; set `spark.sql.files.maxPartitionBytes` for payload
    * size, and push `pathGlobFilter` so only matching assets are listed. */
  def readBinaryFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Demo media table synthesized from the `documents` table: text bytes
    * as the opaque payload (deterministic; exercises schema + typed
    * metadata + featurize at any SF). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        lit("application/octet-stream").as("mime"),
        lit(64).as("width"),
        lit(64).as("height"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Feature table as a DataFrame with stable column order + sort (for
    * the driver's rows-only verification). */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featurize(mediaFromDocuments(spark, dir))
      .toDF()
      .select(col("media_id"), col("mime"), col("n_bytes"), col("checksum"),
        round(aggregate(col("features"), lit(0.0d), (a, v) => a + v), 6)
          .as("feature_sum"))
      .orderBy("media_id")
  }
}
