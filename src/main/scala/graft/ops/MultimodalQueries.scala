package graft.ops

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal pack: binary-column decode plumbing + frame sampling.
  * The decode is a deterministic stub ([[graft.multimodal.FakeCodec]]),
  * so the DuckDB oracle can recompute the same metadata from the text
  * bytes — the correctness gate covers the full Spark-side path
  * (binary cast → mapPartitions batch iterator → typed Dataset).
  */
object MultimodalQueries {
  import Tables.load

  val all: Seq[Q] = Seq(

    // strlen (BYTE length) in the oracle, not length (characters): the
    // Spark side measures the UTF-8 payload bytes, and the two only
    // coincide for pure-ASCII text.
    Q("mm_decode_meta", (spark, dir) =>
      Multimodal.decodeMeta(spark, load(spark, dir, "documents")).toDF(),
      oracle = Some("""
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS byte_len,
             CAST(strlen(text) % 640 + 1 AS INT) AS width,
             CAST((strlen(text) * 7) % 480 + 1 AS INT) AS height,
             md5(text) AS phash
      FROM documents""")),

    Q("mm_frame_sample", (spark, dir) =>
      Multimodal.sampleFrames(load(spark, dir, "documents")),
      oracle = Some("""
      SELECT doc_id, unnest(range(0, strlen(text) % 5 + 1)) AS frame_idx
      FROM documents""")),
  )
}
