package graft.dedup

import graft.SparkTestBase
import graft.functions.TextFunctions
import graft.dedup.ExactJaccard
import org.apache.spark.sql.functions._

/** LSH dedup paths vs the exact ground truth on the test corpus —
  * the recall contract the rows-only driver queries rely on. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("0.01") + "/documents.parquet")

  /** Exact 3-shingle Jaccard pairs at threshold (all-pairs ground truth). */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val d = docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("sh"))
    val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jac", inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jac") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("corpus has planted near-duplicates (sanity)") {
    assert(exactPairs.nonEmpty)
  }

  test("MinHash LSH finds every exact-Jaccard pair ≥ threshold (recall 1.0 here)") {
    val got = MinHashLSH.duplicatePairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.subsetOf(got),
      s"missed: ${exactPairs -- got}")
    // and no false positives below threshold (verification step filters)
    assert(got.subsetOf(exactPairs), s"extra: ${got -- exactPairs}")
  }

  test("identical texts have identical simhash (hamming 0) and are paired") {
    val pairs = SimHash.duplicatePairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every exact-duplicate text pair must appear at distance 0
    val exactDups = docs.as("a").join(docs.as("b"),
        col("a.text") === col("b.text") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val simhashPairs = pairs.map(p => (p._1, p._2)).toSet
    assert(exactDups.subsetOf(simhashPairs))
    pairs.filter(p => exactDups.contains((p._1, p._2)))
      .foreach(p => assert(p._3 === 0))
  }

  test("ExactJaccard df-cap: no-op at high cap, prunes at low cap") {
    val uncapped = ExactJaccard.pairs(docs, "doc_id", "text", "lang").count()
    val highCap = ExactJaccard.pairs(docs, "doc_id", "text", "lang",
      maxShingleDf = Some(1000000)).count()
    assert(highCap === uncapped)
    val lowCap = ExactJaccard.pairs(docs, "doc_id", "text", "lang",
      maxShingleDf = Some(1)).count()
    // with df ≤ 1 only document-unique shingles remain → no shared
    // shingles → no pairs
    assert(lowCap === 0)
  }

  test("DedupClusters: chain, triangle, and pair resolve to min-id components") {
    // chain 1-2-3-4, triangle 10-11, 11-12, 10-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = DedupClusters.components(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("DedupClusters: empty pair graph yields empty components (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupClusters.components(empty, "id_a", "id_b").count() === 0L)
  }

  test("simhash signature is deterministic across evaluations") {
    val s1 = docs.select(SimHash.simhash60(col("text"))).collect().map(_.getLong(0))
    val s2 = docs.select(SimHash.simhash60(col("text"))).collect().map(_.getLong(0))
    assert(s1 === s2)
  }

  test("paragraph dedup: boilerplate chunks vanish, unique docs pass through verbatim") {
    // synthetic corpus: an 8-token boilerplate chunk planted in 3 docs
    // (≥ the threshold), one short doc (< chunk size), one doc that is
    // ALL boilerplate, one untouched unique doc
    val bp = (1 to 8).map(i => s"bp$i").mkString(" ")
    val docs = Seq(
      (0L, s"$bp alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$bp one two three four five six seven eight"),
      (2L, bp), // all boilerplate → cleaned to empty
      (3L, "lone words that appear nowhere else at all"), // 8 unique tokens
      (4L, "tiny doc")) // single sub-size chunk, unique
      .map { case (id, t) => (id, t, "en", "srcT", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("para_dedup")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_paragraphs")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) === ((2L, 1L, "alpha beta gamma delta epsilon zeta eta theta")))
    assert(out(1L) === ((2L, 1L, "one two three four five six seven eight")))
    assert(out(2L) === ((1L, 1L, ""))) // all chunks removed → empty text
    assert(out(3L) === ((1L, 0L, "lone words that appear nowhere else at all")))
    assert(out(4L) === ((1L, 0L, "tiny doc")))
  }

  test("MinHash estimator: every near-dup pair's estimate lands within 0.25 of true Jaccard") {
    Seq(sf("0.001"), sf("0.01")).foreach { dir =>
      val rows = graft.SparkEntry.queries("dedup_minhash_estimate")(spark, dir)
        .select(org.apache.spark.sql.functions.col("jaccard"),
          org.apache.spark.sql.functions.col("estimate"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(rows.nonEmpty, s"no near-dup pairs at $dir")
      // 16 components: σ = sqrt(J(1−J)/16) ≤ 0.125; 0.25 = 2σ at the
      // worst J, a generous per-pair bound — and the mean error should
      // sit well inside one σ
      rows.foreach { case (j, e) =>
        assert(math.abs(j - e) <= 0.25, s"estimate $e vs true $j at $dir") }
      val mean = rows.map { case (j, e) => math.abs(j - e) }.sum / rows.size
      assert(mean <= 0.125, s"mean |err| $mean at $dir")
    }
  }

  test("graph_kcore: 3 peel rounds reach the 2-core fixpoint on both sf corpora") {
    import org.apache.spark.sql.functions._
    // the declared query unrolls exactly 3 peel rounds; the k-core is
    // only correct if that is a FIXPOINT on the corpus — i.e. a 4th
    // round removes nothing. Replay the peeling here with a variable
    // round count and compare 3 vs 4.
    def kcore(dir: String, rounds: Int): Map[Long, Long] = {
      val pairs = graft.dedup.ExactJaccard.pairs(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", "lang", shingleN = 3, threshold = 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      var edges = pairs
        .union(pairs.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint(true)
      for (_ <- 1 to rounds) {
        val keep = edges.groupBy(col("a").as("node"))
          .agg(count(lit(1)).as("d")).filter(col("d") >= 2).select(col("node"))
        edges = edges
          .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
      }
      edges.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    Seq(sf("0.001"), sf("0.01")).foreach { dir =>
      val r3 = kcore(dir, 3)
      val r4 = kcore(dir, 4)
      assert(r3 === r4, s"peeling not converged after 3 rounds at $dir")
      // and the query surface agrees with the replay
      val declared = graft.SparkEntry.queries("graph_kcore")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(declared === r3)
    }
  }

  test("substring spans: planted verbatim overlap recovered at exact token length") {
    // docs 1/2 share a verbatim 15-token span (>= report threshold 12);
    // docs 1/3 share only 10 tokens (seeds match but span < 12 → no
    // report); doc 4 is disjoint filler.
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared15 = words("s", 15)
    val shared10 = words("u", 10)
    val rows = Seq(
      (1L, s"${words("a", 5)} $shared15 ${words("b", 4)} $shared10"),
      (2L, s"${words("c", 9)} $shared15 ${words("d", 2)}"),
      (3L, s"$shared10 ${words("e", 12)}"),
      (4L, words("z", 40)))
    val dir = tmpDir("substr_docs")
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_substring_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 15L),
      s"expected exactly the 15-token pair, got $got")
    // the removal step cuts the span from the HIGHER doc only: doc 2
    // loses exactly the 15 shared tokens at its offset 9, rebuilding
    // c0..c8 d0 d1; docs 1/3/4 are untouched (no >= 12-token span)
    val surgery = graft.SparkEntry.queries("dedup_substring_removal")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val expectedText = (words("c", 9) + " " + words("d", 2))
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedText.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(surgery === Map(2L -> (9L, 15L, 11L, expectedMd5)),
      s"unexpected surgery receipts: $surgery")
  }
}
