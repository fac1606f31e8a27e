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

    // Resize planning: aspect-fit the (fake-decoded) dimensions into a
    // 224×224 box with pure integer arithmetic — the metadata transform
    // a vision-preprocessing stage computes per image; exact on any
    // engine, so fully oracled.
    Q("mm_resize_fit", (spark, dir) =>
      Multimodal.resizeFit(spark, load(spark, dir, "documents"), 224),
      oracle = Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(strlen(text) % 640 + 1 AS BIGINT) AS width,
               CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height
        FROM documents)
      SELECT doc_id, width, height,
             CAST(CASE WHEN width >= height THEN 224
                       ELSE (width * 224) // height END AS BIGINT) AS out_w,
             CAST(CASE WHEN width >= height THEN (height * 224) // width
                       ELSE 224 END AS BIGINT) AS out_h
      FROM m""")),

    // Feature extraction: 8-bucket byte-class histogram per document —
    // the deterministic stand-in for an embedding model, showing the
    // decode → feature → vector bridge into the similarity stack.
    // Counts over character-code buckets (code >> 5), one int/int
    // division per component — exact cross-engine.
    Q("mm_embed_bytehist", (spark, dir) =>
      Multimodal.byteHistogram(load(spark, dir, "documents")),
      oracle = Some("""
      SELECT doc_id, p.pos,
             CAST(len(list_filter(
                    list_transform(string_split(text, ''), c -> ascii(c) % 256 // 32),
                    x -> x = p.pos)) AS DOUBLE)
               / len(string_split(text, '')) AS v
      FROM documents, (SELECT unnest(range(0, 8)) AS pos) p""")),
  )
}
