package graft.ops

import graft.functions.VectorFunctions._
import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search pack over `embeddings` (array<float>, 64-dim):
  * brute-force cosine top-k as the exact baseline, a threshold
  * near-duplicate join, and an SRP-LSH bucketed variant as the scale
  * path. Scores are double-precision sequential folds — bit-identical
  * to the DuckDB oracle (verified empirically on all sf0.01 pairs).
  */
object VectorQueries {
  import Tables.load

  /** Shared oracle fragment: cosine of two float lists in double. */
  private val oracleCos =
    """list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      | / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
      |    * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))))"""
      .stripMargin

  val all: Seq[Q] = Seq(

    // Brute-force exact top-5 cosine neighbours for 20 query vectors.
    // The baseline ANN: broadcast the queries, scan the corpus once.
    Q("sim_topk_bruteforce", (spark, dir) => {
      val e = load(spark, dir, "embeddings")
      val queries = broadcast(e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      queries.join(e.select(col("vec_id").as("neighbor_id"), col("embedding")),
          col("query_id") =!= col("neighbor_id"))
        .withColumn("score", VectorExpressions.cosine_sim(spark, col("qv"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
    }, oracle = Some(s"""
      WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               $oracleCos AS score
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < 20),
      ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, rank, score FROM ranked WHERE rank <= 5"""),
      bench = true),

    // Embedding near-duplicate join: all pairs above a cosine threshold
    // (blocked by label to bound the pair space — the exact analogue of
    // lang-blocking in text dedup).
    Q("dedup_embedding_cosine", (spark, dir) => {
      val e = load(spark, dir, "embeddings")
      val a = e.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("score", VectorExpressions.cosine_sim(spark, col("va"), col("vb")))
        .filter(col("score") >= 0.4)
        .select(col("id_a"), col("id_b"), col("score"))
    }, oracle = Some(s"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, $oracleCos AS score
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE $oracleCos >= 0.4""")),

    // SRP-LSH bucketed ANN — the scale path: bucket on an 8-bit
    // sign-random-projection signature, search within bucket only.
    // Algorithm-specific hashing → rows-only; recall vs the brute-force
    // truth is asserted in VectorSpec.
    Q("sim_lsh_bucketed", (spark, dir) => {
      val e = load(spark, dir, "embeddings")
        .withColumn("bucket", graft.functions.VectorFunctions.srpBucket(col("embedding"), 8))
      val a = e.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("score", VectorExpressions.cosine_sim(spark, col("va"), col("vb")))
        .filter(col("score") >= 0.3)
        .select(col("id_a"), col("id_b"), col("score"))
        .orderBy(col("id_a"), col("id_b"))
    }),
  )
}
