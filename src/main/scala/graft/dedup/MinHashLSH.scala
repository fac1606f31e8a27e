package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection over a text column —
  * the scale path for fuzzy dedup: shingle → k minhashes → b bands →
  * bucket equi-join → exact-Jaccard verification of candidates only.
  *
  * All-pairs Jaccard is O(n²) and impossible at 100 TB; LSH reduces it
  * to an equi-join on (band, bandHash) whose cost tracks the number of
  * genuinely similar pairs. With b bands of r rows (k = b·r), a pair of
  * Jaccard s collides with probability 1-(1-s^r)^b — the (b, r) defaults
  * (16, 4) put the S-curve threshold near s ≈ 0.5.
  *
  * Signature computation shape matters: a naive `array(k × array_min(
  * transform(shingles…)))` projection re-evaluates the shingling k times
  * (Catalyst does not CSE across array elements — measured 64× blowup).
  * Instead we explode to (id, shingleHash) rows ONCE and take k `min`
  * aggregates — one narrow pass + one partial-agg shuffle on id, the
  * same plan shape at any scale.
  */
object MinHashLSH {

  /** (id, sig: array<long>[numHashes]) — one-pass signature via the
    * custom [[graft.functions.expressions.MinHashAgg]] sketch aggregate
    * (single k-slot buffer per group; 3× faster than k separate `min`
    * aggregates and order/partitioning-independent). */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int, numHashes: Int): DataFrame =
    signaturesOver(explodedShingles(docs, idCol, textCol, shingleN), numHashes)

  /** Signatures over a pre-exploded (id, s) shingle stream — lets the
    * LSH share [[ExactJaccard.postings]]' checkpointed inverted index
    * instead of re-running tokenize+shingle+explode over the corpus. */
  def signaturesOver(ex: DataFrame, numHashes: Int): DataFrame = {
    val spark = ex.sparkSession
    ex.select(col("id"), xxhash64(col("s")).as("h"))
      .groupBy("id")
      .agg(graft.functions.expressions.MinHashAgg.minhash_agg(spark, col("h"), numHashes)
        .as("sig"))
  }

  private def explodedShingles(docs: DataFrame, idCol: String, textCol: String,
                               shingleN: Int): DataFrame =
    docs.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        explode(TextFunctions.shinglesFromTokens(col("toks"), shingleN)).as("s"))

  /** Candidate pairs + exact verification.
    *
    * @param sharedPostings a pre-built (id, s[, …]) exploded shingle
    *        frame (e.g. [[ExactJaccard.postings]]) to reuse for BOTH
    *        the signatures and the exact verification — without it the
    *        corpus is shingled twice just for this operator, and a
    *        third time by any exact-Jaccard query in the same session.
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold,
    *         jaccard computed exactly on the shingle sets.
    */
  def duplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                     shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                     threshold: Double = 0.5,
                     sharedPostings: Option[DataFrame] = None): DataFrame = {
    val r = numHashes / bands
    val ex = sharedPostings.getOrElse(
      explodedShingles(docs, idCol, textCol, shingleN))
    val sig = signaturesOver(ex, numHashes)

    // band key: hash of the band's slice of the signature. Only
    // (id, band, bandkey) flows into the self-join — shingle sets and
    // signatures stay out of the shuffle.
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bandkey")

    // bucket equi-join on (band, bandkey); distinct pairs across bands
    val cand = banded.select(col("band"), col("bandkey"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bandkey"), col("id").as("id_b")),
        Seq("band", "bandkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // exact Jaccard on the candidates only: re-assemble shingle sets
    // from the shared exploded stream and attach to the (few)
    // surviving pairs (shingles are distinct per doc by construction,
    // so collect_list rebuilds the set)
    val shapes = ex.groupBy(col("id")).agg(collect_list(col("s")).as("sh"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac = inter.cast("double") /
      (size(col("sh_a")) + size(col("sh_b")) - inter)
    cand
      .join(shapes.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shapes.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
