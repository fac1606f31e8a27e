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

    // The full multimodal RETRIEVAL bridge: decode-stand-in features
    // (the 8-bucket byte histogram) become float vectors, and the
    // payload table runs the same broadcast-queries × corpus-scan
    // top-k cosine as the embedding stack — media similarity search
    // with zero new machinery. Native codegen'd cosine on the Spark
    // side; the oracle recomputes histogram AND cosine from scratch
    // (sequential double folds both sides — bit-identical).
    Q("mm_embed_topk", (spark, dir) => {
      val h = Multimodal.byteHistogram(load(spark, dir, "documents"))
      // materialized once: BOTH sides of the self-join read the same
      // 8-float vectors — without this the feature extraction (a
      // per-char scan) runs twice
      val vecs = h.groupBy(col("doc_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v").cast("float")).as("vec"))
        .localCheckpoint(true)
      // query SAMPLE capped at 64: an uncapped %-of-corpus frame makes
      // the broadcast-queries × corpus scan quadratic in N
      val queries = broadcast(vecs.filter(col("doc_id") % 97 === 0 && col("doc_id") < 97L * 64)
        .select(col("doc_id").as("query_id"), col("vec").as("qv")))
      // Ranking via the bounded-heap pair aggregate, not
      // row_number().over(partitionBy(query_id)): the window form sorts
      // each query's whole corpus-sized candidate set in one task; the
      // heap keeps O(k) per-query state and combines map-side.
      queries.join(vecs.select(col("doc_id").as("neighbor_id"), col("vec")),
          col("query_id") =!= col("neighbor_id"))
        .withColumn("score",
          graft.functions.expressions.VectorExpressions.cosine_sim(
            spark, col("qv"), col("vec")))
        .groupBy(col("query_id"))
        .agg(graft.functions.expressions.TopKPairAgg
          .topk_pair_agg(spark, col("score"), col("neighbor_id"), 3).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), col("col.id").as("neighbor_id"),
          (col("pos") + 1).cast("int").as("rank"), col("col.score").as("score"))
    }, oracle = Some {
      def cos(x: String, y: String) =
        s"""list_sum(list_transform(list_zip($x, $y),
           |  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           | / (sqrt(list_sum(list_transform($x, p -> CAST(p AS DOUBLE)*CAST(p AS DOUBLE))))
           |    * sqrt(list_sum(list_transform($y, p -> CAST(p AS DOUBLE)*CAST(p AS DOUBLE)))))"""
          .stripMargin
      s"""
      WITH hist AS (
        SELECT doc_id, list(CAST(v AS REAL) ORDER BY pos) AS vec FROM (
          SELECT doc_id, p.pos,
                 CAST(len(list_filter(
                        list_transform(string_split(text, ''), c -> ascii(c) % 256 // 32),
                        x -> x = p.pos)) AS DOUBLE)
                   / len(string_split(text, '')) AS v
          FROM documents, (SELECT unnest(range(0, 8)) AS pos) p)
        GROUP BY doc_id),
      scored AS (
        SELECT q.doc_id AS query_id, n.doc_id AS neighbor_id,
               ${cos("q.vec", "n.vec")} AS score
        FROM hist q JOIN hist n ON n.doc_id <> q.doc_id
        WHERE q.doc_id % 97 = 0 AND q.doc_id < 6208),
      ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= 3"""
    }),

    // PERCEPTUAL-HASH near-duplicate detection over media payloads —
    // the image-dedup shape (pHash/dHash): a 16-bucket byte histogram
    // of the payload thresholds into a 16-bit signature — bit p set
    // when bucket p's share exceeds the corpus MEDIAN share for that
    // bucket (pHash thresholds its DCT coefficients at the median for
    // exactly this reason: each bit splits the population, so the
    // signature discriminates — 474 distinct codes over this corpus).
    // The 16 medians are exact distributed selections (no floating
    // accumulation — Spark `percentile` and DuckDB `quantile_cont`
    // share the lerp bit-for-bit) broadcast as a 16-row frame.
    // Exact-signature pairs are hamming-0 duplicates; hamming-1 pairs
    // surface through BIT-FLIP PROBING — each code joins its 16
    // one-bit flips against the code table, so candidate generation is
    // 17 equi-joins on the signature, never an all-pairs hamming scan
    // (the pigeonhole trick SimHash uses at 100 TB). The ascending-id
    // filter makes each unordered pair surface exactly once (the probe
    // from the smaller id is the only survivor).
    Q("mm_phash_neardup", (spark, dir) => {
      // one char explode + one keyed count, NOT 16 interpreted lambda
      // passes over the char array (HOF lambdas don't codegen; the
      // per-position filter formulation measured 6× slower). Missing
      // buckets zero-fill via the 16-way position expansion so the
      // median and the bit pattern see every position.
      val chars = load(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .select(col("doc_id"), (ascii(col("ch")) % 16).as("pos"))
      val cnts = chars.groupBy(col("doc_id"), col("pos"))
        .agg(count(lit(1)).as("cnt"))
      val h = chars.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
        .select(col("doc_id"), col("len"),
          explode(sequence(lit(0), lit(15))).as("pos"))
        .join(cnts, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"),
          (coalesce(col("cnt"), lit(0L)).cast("double")
            / col("len").cast("double")).as("v"))
      val med = h.groupBy(col("pos")).agg(expr("percentile(v, 0.5)").as("mv"))
      val codes = h.join(broadcast(med), Seq("pos"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("v") > col("mv"),
            expr("shiftleft(CAST(1 AS BIGINT), pos)")).otherwise(0L)).as("code"))
        .localCheckpoint(true)
      val b = codes.select(col("doc_id").as("id_b"), col("code").as("cb"))
      val exact = codes.select(col("doc_id").as("id_a"), col("code").as("ca"))
        .join(b, col("ca") === col("cb") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(0).as("hamming"))
      val onebit = codes
        .select(col("doc_id").as("id_a"),
          explode(sequence(lit(0), lit(15))).as("bit"), col("code"))
        .withColumn("flipped", expr("code ^ shiftleft(CAST(1 AS BIGINT), bit)"))
        .join(b, col("flipped") === col("cb") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(1).as("hamming"))
      exact.unionByName(onebit)
        .groupBy(col("hamming"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_a")).as("n_left_docs"))
    }, oracle = Some("""
      WITH hist AS (
        SELECT doc_id, p.pos,
               CAST(len(list_filter(
                      list_transform(string_split(text, ''), c -> ascii(c) % 16),
                      x -> x = p.pos)) AS DOUBLE)
                 / len(string_split(text, '')) AS v
        FROM documents, (SELECT unnest(range(0, 16)) AS pos) p),
      med AS (
        SELECT pos, quantile_cont(v, 0.5) AS mv FROM hist GROUP BY 1),
      codes AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN h.v > med.mv
                             THEN (CAST(1 AS BIGINT) << h.pos)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS code
        FROM hist h JOIN med ON med.pos = h.pos GROUP BY 1),
      exact AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
        FROM codes a JOIN codes b
          ON a.code = b.code AND a.doc_id < b.doc_id),
      onebit AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1 AS hamming
        FROM codes a, (SELECT unnest(range(0, 16)) AS bit) f, codes b
        WHERE xor(a.code, CAST(1 AS BIGINT) << f.bit) = b.code
          AND a.doc_id < b.doc_id),
      pairs AS (SELECT * FROM exact UNION ALL SELECT * FROM onebit)
      SELECT hamming, count(*) AS n_pairs,
             count(DISTINCT id_a) AS n_left_docs
      FROM pairs GROUP BY 1""")),
  )
}
