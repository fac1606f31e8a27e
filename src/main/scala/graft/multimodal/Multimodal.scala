package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine
  * as opaque `binary` columns with typed metadata, processed in
  * batch-shaped partition iterators.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container): [[FakeCodec.decode]] derives deterministic metadata from
  * the raw bytes. The Spark-side plumbing is real and is the part that
  * matters at 100 TB: binary columns stream through Tungsten rows,
  * `mapPartitions` gives the codec a batch iterator per partition (the
  * Scala analogue of `mapInPandas` batches), partitioning is inherited
  * from the source, and nothing collects to the driver.
  */
final case class MediaMeta(doc_id: Long, byte_len: Long, width: Int,
                           height: Int, phash: String)

object FakeCodec {
  /** Deterministic stand-in for an image decoder: real codecs replace
    * this one function; schema/batching stay identical. */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    MediaMeta(id, bytes.length.toLong,
      (bytes.length % 640 + 1).toInt, (bytes.length * 7 % 480 + 1).toInt, hex)
  }
}

object Multimodal {

  /** documents → opaque binary payload column (the ingest shape a real
    * media table would have: id + bytes + source metadata). */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      col("source"))

  /** Decode / feature-extract over partition-batched iterators. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    asBinaryTable(docs)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeCodec.decode(id, bytes) })
  }

  /** Frame sampling: one row per sampled frame, frame count derived
    * from the (fake-decoded) payload — the explode shape a video
    * pipeline uses; partition-local, no shuffle. */
  def sampleFrames(docs: DataFrame): DataFrame =
    asBinaryTable(docs)
      .withColumn("n_frames", length(col("payload")) % 5 + lit(1))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1)).as("frame_idx"))

  /** Aspect-fit resize planning into a `box`×`box` target: the longer
    * side pins to `box`, the shorter scales by the same integer ratio —
    * pure integer arithmetic over the decoded dimensions (a narrow
    * projection; the actual pixel resample happens at the codec
    * boundary like [[FakeCodec.decode]]). */
  def resizeFit(spark: SparkSession, docs: DataFrame, box: Int): DataFrame =
    decodeMeta(spark, docs).toDF()
      .select(col("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(box.toLong))
          .otherwise(expr(s"(width * $box) div height")).as("out_w"),
        when(col("width") >= col("height"), expr(s"(height * $box) div width"))
          .otherwise(lit(box.toLong)).as("out_h"))

  /** 8-bucket byte-class histogram per document, normalized — the
    * deterministic stand-in for a learned embedding (decode → feature
    * → vector). One codegen'd projection per (doc, bucket); no UDF. */
  def byteHistogram(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        transform(split(col("text"), ""), c => pmod(ascii(c), lit(256))).as("codes"))
      .select(col("doc_id"), col("codes"),
        explode(sequence(lit(0), lit(7))).as("pos"))
      .select(col("doc_id"), col("pos"),
        (size(filter(col("codes"), x => shiftright(x, 5) === col("pos")))
          .cast("double") / size(col("codes"))).as("v"))
}
