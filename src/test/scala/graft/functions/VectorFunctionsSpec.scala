package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._
  import VectorFunctions._

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      vdot($"a", $"b").as("dot"),
      vnorm($"a").as("na"),
      cosine($"a", $"a").as("self"),
      l2sq($"a", $"b").as("d2")).head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === math.sqrt(14.0))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12) // self-cosine ≈ 1
    assert(r.getDouble(3) === 27.0)
  }

  test("native cosine_sim expression bit-matches the HOF cosine, incl. via SQL") {
    import graft.functions.expressions.VectorExpressions
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet").limit(100)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib")
    val mismatches = pairs
      .withColumn("c1", cosine($"va", $"vb"))
      .withColumn("c2", VectorExpressions.cosine_sim(spark, $"va", $"vb"))
      .filter($"c1" =!= $"c2").count()
    assert(mismatches === 0)
    // SQL surface
    VectorExpressions.register(spark)
    e.createOrReplaceTempView("emb_t")
    val sqlSelf = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_t LIMIT 5")
      .collect().map(_.getDouble(0))
    sqlSelf.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("native l2_sq expression bit-matches the HOF squared-L2, and rejects non-float arrays") {
    import graft.functions.expressions.VectorExpressions
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet").limit(100)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val mismatches = a.crossJoin(b).filter($"ia" < $"ib")
      .withColumn("d1", l2sq($"va", $"vb"))
      .withColumn("d2", VectorExpressions.l2_sq(spark, $"va", $"vb"))
      .filter($"d1" =!= $"d2").count()
    assert(mismatches === 0)
    // self-distance is exactly zero; type misuse fails analysis
    assert(e.select(VectorExpressions.l2_sq(spark, $"embedding", $"embedding"))
      .head().getDouble(0) === 0.0)
    val bad = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("x", "y")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorExpressions.l2_sq(spark, $"x", $"y")).collect()
    }
  }

  test("cosine_sim rejects non-float arrays on BOTH sides (no silent byte misread)") {
    import graft.functions.expressions.VectorExpressions
    VectorExpressions.register(spark)
    spark.range(1).selectExpr("array(CAST(1.0 AS FLOAT)) AS f",
      "array(CAST(1.0 AS DOUBLE)) AS d").createOrReplaceTempView("cs_t")
    // right side double-backed: must fail analysis, not read wrong bytes
    intercept[Exception](spark.sql("SELECT cosine_sim(f, d) FROM cs_t").collect())
    intercept[Exception](spark.sql("SELECT cosine_sim(d, f) FROM cs_t").collect())
    assert(spark.sql("SELECT cosine_sim(f, f) FROM cs_t").collect().head.getDouble(0) === 1.0)
  }

  test("cosine is symmetric and bounded") {
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet").limit(50)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val scores = a.crossJoin(b).filter($"ia" < $"ib")
      .select(cosine($"va", $"vb").as("ab"), cosine($"vb", $"va").as("ba"))
      .collect()
    scores.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) >= -1.0000001 && r.getDouble(0) <= 1.0000001)
    }
  }

  test("SRP-LSH: identical vectors share a bucket; bucket in range") {
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .withColumn("bucket", srpBucket($"embedding", 8))
    val buckets = e.select("bucket").collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 256))
    // deterministic
    val again = e.select("bucket").collect().map(_.getLong(0))
    assert(buckets === again)
  }

  test("IVF probe returns genuine neighbours: rank-1 hits overlap brute-force top-5") {
    val dir = sf("0.001")
    val ivf = graft.SparkEntry.queries("sim_ivf_probe")(spark, dir)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val brute = graft.SparkEntry.queries("sim_topk_bruteforce")(spark, dir)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // IVF's top hit should usually be among brute-force top-5 (same-cell
    // neighbours are the near ones); require a majority, not perfection
    val hits = ivf.count { case (q, n) => brute.getOrElse(q, Set.empty).contains(n) }
    assert(hits * 2 > ivf.size, s"IVF top-1 in brute top-5 for only $hits/${ivf.size} queries")
  }

  test("trained IVF centroids: top-5 recall vs brute force at least matches the untrained seeding") {
    import graft.functions.expressions.VectorExpressions
    import org.apache.spark.sql.expressions.Window
    val dir = sf("0.001")
    val e = spark.read.parquet(dir + "/embeddings.parquet")
    // the r3 UNTRAINED probe: every-25th seeds ARE the centroids
    def probeWith(cents: org.apache.spark.sql.DataFrame) = {
      val wA = Window.partitionBy($"vec_id").orderBy($"cscore".desc, $"cent_id")
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("cscore", VectorExpressions.cosine_sim(spark, $"embedding", $"cv"))
        .withColumn("crk", row_number().over(wA)).filter($"crk" === 1)
        .select($"vec_id", $"embedding", $"cent_id")
      val wR = Window.partitionBy($"query_id").orderBy($"score".desc, $"neighbor_id")
      assigned.filter($"vec_id" < 20)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"cent_id")
        .join(assigned.select($"vec_id".as("neighbor_id"), $"embedding", $"cent_id"),
          Seq("cent_id"))
        .filter($"query_id" =!= $"neighbor_id")
        .withColumn("score", VectorExpressions.cosine_sim(spark, $"qv", $"embedding"))
        .withColumn("rank", row_number().over(wR)).filter($"rank" <= 5)
        .select($"query_id", $"neighbor_id")
    }
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(graft.SparkEntry.queries("sim_topk_bruteforce")(spark, dir))
    val seeded = pairsOf(probeWith(e.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"))))
    val trained = pairsOf(graft.SparkEntry.queries("sim_ivf_probe")(spark, dir))
    def recall(got: Set[(Long, Long)]) = got.count(brute).toDouble / brute.size
    assert(recall(trained) >= recall(seeded),
      s"trained=${recall(trained)} seeded=${recall(seeded)}")
  }

  test("multi-probe IVF: candidate superset of single-probe, recall strictly dominates") {
    val dir = sf("0.001")
    def pairsOf(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf("sim_topk_bruteforce")
    val single = pairsOf("sim_ivf_probe")
    val multi = pairsOf("sim_ivf_multiprobe")
    def recall(got: Set[(Long, Long)]) = got.count(brute).toDouble / brute.size
    // the top-1 cell is always among the top-3 probed cells, so the
    // multi-probe candidate space CONTAINS the single-probe one —
    // recall@5 is monotone in nProbe by construction
    assert(recall(multi) >= recall(single),
      s"multi=${recall(multi)} single=${recall(single)}")
    // and on this corpus the extra cells genuinely buy recall: the
    // multi-probe result must recover brute-force pairs the
    // single-probe search missed (STRICT improvement, the contract the
    // nProbe knob exists for)
    val recovered = (multi -- single).count(brute)
    assert(recovered > 0,
      s"nProbe=3 recovered no brute-force pairs beyond nProbe=1 " +
        s"(multi=${recall(multi)} single=${recall(single)})")
  }

  test("SemDeDup recall: IVF-cell blocking finds a usable share of exact ≥0.35 pairs") {
    import graft.functions.expressions.VectorExpressions
    val dir = sf("0.001")
    val e = spark.read.parquet(dir + "/embeddings.parquet")
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("score", VectorExpressions.cosine_sim(spark, $"va", $"vb"))
      .filter($"score" >= 0.35)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = graft.SparkEntry.queries("dedup_semantic_ivf")(spark, dir)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // within-cell pairs are a SUBSET of all pairs (no false positives)
    assert(blocked.subsetOf(exact))
    // and near-duplicates co-locate often enough to be the scale path
    val recall = if (exact.isEmpty) 1.0 else blocked.count(exact).toDouble / exact.size
    assert(recall >= 0.3, s"SemDeDup recall $recall (${blocked.size}/${exact.size})")
  }

  test("SRP-LSH recall: most brute-force top-1 neighbours share the query's bucket at 4 planes") {
    // with 4 hyperplanes (16 buckets) the nearest neighbour should very
    // often fall in the same bucket — a sanity floor, not a guarantee
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet").limit(200)
      .withColumn("bucket", srpBucket($"embedding", 4))
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"), $"bucket".as("ba"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"), $"bucket".as("bb"))
    val top1 = a.crossJoin(b).filter($"ia" =!= $"ib")
      .withColumn("score", cosine($"va", $"vb"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"ia")
          .orderBy($"score".desc, $"ib")))
      .filter($"rk" === 1)
    // chance rate with 16 buckets is 1/16 = 0.0625; the LSH must beat it
    // (these synthetic embeddings are near-orthogonal — top-1 cosine is
    // only ~0.5 — so the absolute rate stays modest)
    val hit = top1.filter($"ba" === $"bb").count().toDouble / top1.count()
    assert(hit > 0.0625, s"same-bucket top-1 rate $hit not better than chance")
  }

  test("PQ codes: every vector carries exactly one code per subspace, from that subspace's codebook") {
    val dir = sf("0.001")
    val adc = graft.SparkEntry.queries("sim_pq_adc")(spark, dir)
    assert(adc.count() > 0)
    // replay the public shape: 20 queries × top-5, ranks 1..5, adc_dist ≥ 0
    val byQ = adc.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), min($"adc_dist").as("dmin"),
        array_sort(collect_list($"rank")).as("ranks"))
      .collect()
    byQ.foreach { r =>
      assert(r.getAs[Long]("n") === 5L)
      assert(r.getAs[Double]("dmin") >= 0.0)
      assert(r.getAs[Seq[Int]]("ranks") === Seq(1, 2, 3, 4, 5))
    }
  }

  test("PQ ADC top-5 recalls a usable share of the exact top-5 (normalized corpus: L2 ranks = cosine ranks)") {
    // sf0.01, not sf0.001: the every-25th seeding needs a corpus big
    // enough for a non-degenerate codebook (K = N/25 per subspace —
    // 20 here vs 2 at sf0.001, where PQ resolution collapses)
    val dir = sf("0.01")
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(graft.SparkEntry.queries("sim_topk_bruteforce")(spark, dir))
    val adc = pairsOf(graft.SparkEntry.queries("sim_pq_adc")(spark, dir))
    val recall = adc.count(brute).toDouble / brute.size
    // 8×8-dim codebooks on near-orthogonal synthetic vectors measure
    // ~0.19 (chance rate for top-5 of ~500 is ~1% — this is ~19×
    // chance; real clustered embeddings quantize far better). A
    // sanity floor, not a guarantee.
    assert(recall >= 0.15, s"PQ ADC recall vs brute force = $recall")
  }

  test("SQ8 re-rank: high recall vs brute force, and every hit survives from the int8 candidate pool") {
    val dir = sf("0.01")
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf(graft.SparkEntry.queries("sim_topk_bruteforce")(spark, dir))
    val sq8 = pairsOf(graft.SparkEntry.queries("sim_sq8_rerank")(spark, dir))
    assert(sq8.size === brute.size, "both return top-5 per query")
    val recall = sq8.count(brute).toDouble / brute.size
    // int8 symmetric quantization distorts each dot product by well
    // under the inter-neighbor score gaps on this corpus, and the 3k
    // candidate pool gives the exact re-rank room to repair ordering
    // errors — recall should be near-perfect, unlike the lossy-code
    // PQ path above. 0.9 is the contract floor, not the typical value.
    assert(recall >= 0.9, s"SQ8+rerank recall vs brute force = $recall")
  }

  test("IVF-PQ: residual coding holds most of full-scan PQ recall at a 2-of-20-cell scan") {
    val dir = sf("0.01")
    def pairsOf(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, dir)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairsOf("sim_topk_bruteforce")
    val pq = pairsOf("sim_pq_adc")        // full-scan PQ: every code
    val ivfpq = pairsOf("sim_ivfpq_adc")  // 2 probed cells of ~20
    def recall(got: Set[(Long, Long)]) = got.count(brute).toDouble / brute.size
    // measured 0.18 vs 0.19 here: residuals are smaller than raw
    // vectors, so the same code budget quantizes them better — which
    // is what pays for the 10× smaller scan. 0.7× is the contract
    // floor, not the typical ratio.
    assert(recall(ivfpq) >= 0.7 * recall(pq),
      s"ivfpq=${recall(ivfpq)} pq=${recall(pq)}")
    assert(recall(ivfpq) >= 0.12, s"ivfpq recall floor: ${recall(ivfpq)}")
  }
}
