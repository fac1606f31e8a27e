package graft.ops

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Curation-pack semantics: partition-invariance of the distributed
  * prefix sum, sampling determinism, survivor optimality, and the
  * quantization error bound. Value-level oracle parity is the driver's
  * DuckDB compare; these pin the algorithmic contracts. */
class CurationSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(sf("0.01") + "/documents.parquet")
  private lazy val emb = spark.read.parquet(sf("0.01") + "/embeddings.parquet")

  test("token-budget prefix sum is partition-count invariant") {
    val counts = docs.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
    def shards(p: Int): Set[(Long, Long, Long)] =
      CurationQueries.tokenBudgetShards(counts, p, 4096)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shards(3) === shards(16))
    assert(shards(1) === shards(16))
  }

  test("token-budget shards partition the corpus exactly") {
    val counts = docs.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
    val out = CurationQueries.tokenBudgetShards(counts, 8, 4096).collect()
    assert(out.map(_.getLong(1)).sum === docs.count())
    val totalTokens = counts.agg(sum("n")).head().getLong(0)
    assert(out.map(_.getLong(2)).sum === totalTokens)
  }

  test("distributed ntile matches Spark's ntile on every size/shape edge") {
    // N < k (each row its own tile), N = k, N mod k = 0, N mod k != 0,
    // and ties in the first sort key (broken by the second)
    for (n <- Seq(3, 10, 40, 47)) {
      val df = spark.range(n.toLong).toDF("id")
        .withColumn("s", col("id") % 7) // duplicate scores → tie-break on id
      val got = CurationQueries.distributedNtile(df, 10, 4, col("s").desc, col("id"))
        .select(col("id"), col("tier"))
      // ground truth: Spark's own ntile, single-partition via metaWindow
      // (same execution as a global window, minus the WindowExec warning)
      val want = df.withColumn("tier",
          ntile(10).over(graft.functions.GlobalRank.metaWindow(col("id"))
            .orderBy(col("s").desc, col("id"))))
        .select(col("id"), col("tier"))
      assert(got.collect().sortBy(_.getLong(0)).toSeq ===
        want.collect().sortBy(_.getLong(0)).toSeq, s"n=$n")
    }
  }

  test("distributed ntile is partition-count invariant") {
    val df = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n"))
    def tiers(p: Int) = CurationQueries
      .distributedNtile(df, 10, p, col("n").desc, col("doc_id"))
      .select(col("doc_id"), col("tier")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(tiers(1) === tiers(7))
    assert(tiers(7) === tiers(32))
  }

  test("hash-stratified sample is deterministic and ~5%") {
    val q = graft.SparkEntry.queries("sample_hash_stratified")
    val a = q(spark, sf("0.01")).collect().map(_.getLong(0)).sorted.toSeq
    val b = q(spark, sf("0.01")).collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.01 && rate < 0.12) // md5 buckets ≈ uniform
  }

  test("quality survivor is a member of its cluster with maximal quality") {
    val out = graft.SparkEntry.queries("dedup_survivor_quality")(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val quality = docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text"), Seq("the", "a", "of", "and", "to")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (_, survivor, n, best) =>
      assert(n >= 2) // clusters come from duplicate pairs
      assert(math.abs(quality(survivor) - best) < 1e-12)
    }
  }

  test("int8 quantization: q in [-127, 127] and reconstruction error ≤ scale/127") {
    val out = graft.SparkEntry.queries("embed_quantize_int8")(spark, sf("0.01"))
    val joined = out.join(
        emb.select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("pos", "v"))), Seq("vec_id", "pos"))
      .select(col("q"), col("scale"), col("v").cast("double").as("v"))
      .collect()
    joined.foreach { r =>
      val (q, scale, v) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(q >= -127 && q <= 127)
      if (scale > 0) assert(math.abs(v - q * scale / 127.0) <= scale / 127.0 + 1e-12)
    }
  }

  test("context windows: full windows hold exactly CTX tokens, totals conserved") {
    val out = graft.SparkEntry.queries("pack_context_windows")(spark, sf("0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val totalTokens = docs
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long"))).head().getLong(0)
    // windows are contiguous 0..W-1 and conserve the corpus token count
    assert(out.map(_._1).toSeq === out.indices.map(_.toLong))
    assert(out.map(_._3).sum === totalTokens)
    // every window but the last is exactly full; none overflows
    out.init.foreach { case (w, _, toks, _) => assert(toks === 512L, s"window $w") }
    assert(out.last._3 <= 512L)
    // doc-touch accounting: sum(n_docs) - distinct docs = total extra
    // window appearances = sum over docs of (windows spanned - 1); a
    // doc split across k windows is counted split in ALL k of them
    val spans = docs.select(TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(_.getLong(0))
    assert(out.map(_._2).sum >= docs.count())
  }

  test("context windows are partition-count and parallelism invariant") {
    // the distributed prefix sum must yield the SAME windows whatever
    // the physical layout — rerun the query over a repartitioned copy
    val q = graft.SparkEntry.queries("pack_context_windows")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val base = rows(q(spark, sf("0.01")))
    val shuffled = spark.read.parquet(sf("0.01") + "/documents.parquet")
      .repartition(17).sortWithinPartitions(col("text"))
    val dir2 = tmpDir("ctx_win_shuffled")
    shuffled.write.parquet(dir2 + "/documents.parquet")
    assert(rows(q(spark, dir2)) === base)
  }

  test("temperature mixture weights are exact integer square roots") {
    val out = graft.SparkEntry.queries("curate_temperature_mixture")(spark, sf("0.01"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (src, toks, w, _) =>
      assert(w * w <= toks && toks < (w + 1) * (w + 1), s"$src: isqrt($toks) != $w")
    }
    // floor division loses < 1 ppm per source
    val ppmSum = out.map(_._4).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - out.length)
    // alpha = 0.5 flattens: smallest source's temperature share is at
    // least its raw token share (sqrt up-weights small sources), modulo
    // ±2 ppm of integer-floor slop
    val minSrc = out.minBy(_._2)
    val totToks = out.map(_._2).sum
    assert(minSrc._4 + 2 >= minSrc._2 * 1000000L / totToks)
  }
}
