package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The two NN-graph analytics operators (`sim_nn_pagerank`,
  * `sim_label_consensus`) checked against independent driver-side
  * reimplementations on the tiny corpus — the graph is rebuilt here
  * by brute force (no SRP buckets, then intersected with the bucketed
  * candidates exactly as the operators define them), the fixed-point
  * rank recursion and the majority vote are folded in plain Scala,
  * and the operator outputs must match row-for-row. The DuckDB oracle
  * already pins cross-engine equality; this spec pins the SEMANTICS
  * (what the recursion computes) independently of both engines.
  */
class NnGraphOpsSpec extends SparkTestBase {

  private val Scale = 1000000000L
  private val Base = Scale * 15 / 100

  /** (vec_id, label, bucket, embedding) for the sf dir, with the same
    * SRP bucket assignment the operators use. */
  private def corpus(dir: String): Seq[(Long, Int, Long, Array[Float])] = {
    graft.plans.VectorHofRewrite.install(spark)
    val e = Tables.load(spark, dir, "embeddings")
    // the operators size the SRP signature from the corpus (linear
    // pair volume) — the reimplementation must bucket identically
    val bits = VectorQueries.srpBits(e.count())
    e.select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.srpBucket(col("embedding"), bits).as("bucket"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getSeq[Float](3).toArray))
      .toSeq
  }

  /** Sequential-fold cosine, the exact arithmetic of
    * VectorExpressions.cosine_sim (left-to-right double accumulation). */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Per-vector bucket peers ranked (score DESC, id ASC) — the
    * operators' candidate order — as id lists. */
  private def rankedPeers(c: Seq[(Long, Int, Long, Array[Float])])
      : Map[Long, Seq[Long]] = {
    val byBucket = c.groupBy(_._3)
    c.map { case (id, _, bkt, v) =>
      val peers = byBucket(bkt).filter(_._1 != id)
        .map { case (pid, _, _, pv) => (pid, cos(v, pv)) }
        .sortBy { case (pid, s) => (-s, pid) }
        .map(_._1)
      id -> peers
    }.toMap
  }

  test("sim_nn_pagerank matches a driver-side fixed-point fold") {
    val dir = sf("0.001")
    val c = corpus(dir)
    val nn = rankedPeers(c).collect { case (id, ps) if ps.nonEmpty => id -> ps.head }
    var ranks = c.map(_._1 -> Scale).toMap
    for (_ <- 1 to 3) {
      val in = nn.toSeq.groupMapReduce(_._2)({ case (u, _) => ranks(u) })(_ + _)
      ranks = ranks.map { case (v, _) => v -> (Base + 85 * in.getOrElse(v, 0L) / 100) }
    }
    val got = graft.SparkEntry.queries("sim_nn_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ranks)
    // structural floor: a node nobody points at holds exactly the base
    val sinks = ranks.keySet -- nn.values.toSet
    assert(sinks.forall(v => got(v) == Base), "in-degree-0 nodes must sit at 0.15*SCALE")
    assert(got.values.max > Scale, "some node must accumulate above the uniform start")
  }

  test("sim_label_consensus matches a driver-side majority vote") {
    val dir = sf("0.001")
    val c = corpus(dir)
    val labels = c.map(t => t._1 -> t._2).toMap
    val expected = rankedPeers(c).collect { case (id, ps) if ps.nonEmpty =>
      val votes = ps.take(3).groupBy(labels).map { case (l, xs) => (l, xs.size) }
      val (consensus, n) = votes.toSeq.minBy { case (l, v) => (-v, l) }
      id -> ((labels(id), consensus, n.toLong, labels(id) == consensus))
    }
    val got = graft.SparkEntry.queries("sim_label_consensus")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got === expected)
  }

  test("curate_coreset_kcenter matches a driver-side farthest-first traversal") {
    val dir = sf("0.001")
    val c = corpus(dir).sortBy(_._1)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val vecs = c.map(t => t._1 -> t._4).toMap
    var chosen = List((c.head._1, Option.empty[Double])) // seed = lowest id
    var dist = c.map(t => t._1 -> l2(t._4, vecs(c.head._1))).toMap
    for (_ <- 2 to 8) {
      val (nid, nd) = dist.toSeq.minBy { case (id, d) => (-d, id) }
      chosen = (nid, Some(nd)) :: chosen
      dist = dist.map { case (id, d) => id -> math.min(d, l2(vecs(id), vecs(nid))) }
    }
    val expected = chosen.reverse.zipWithIndex
      .map { case ((id, sd), i) => (i + 1, id, sd) }
    val got = graft.SparkEntry.queries("curate_coreset_kcenter")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq.sortBy(_._1)
    assert(got === expected)
    // covering radius must be non-increasing round over round
    val radii = got.flatMap(_._3)
    assert(radii === radii.sorted.reverse, "selection distances must decrease")
  }

  test("pagerankRound: DECIMAL(38,0) in-round sums stay exact past the old int64 bound") {
    import spark.implicits._
    // 20 nodes at rank 5·10¹⁷ each, every node's out-edge pointing at
    // node 1: node 1's in-sum is 10¹⁹ > Long.MaxValue, so the old
    // BIGINT sum could not represent it (silent wrap in non-ANSI
    // sessions — the exact cross-engine divergence the r15 require
    // refused at n > 1e8). The widened path must produce the exact
    // BigInt arithmetic result, still typed BIGINT.
    val n = 20
    val big = 500000000000000000L // 5e17
    val nodes = (1L to n).toDF("vec_id")
    val edges = (1L to n).map(v => (v, 1L)).toDF("vec_id", "nn_id")
    val ranks = (1L to n).map(v => (v, big)).toDF("vec_id", "r")
    val out = VectorQueries.pagerankRound(nodes, edges, ranks)
    assert(out.schema("r").dataType === org.apache.spark.sql.types.LongType,
      "rank_fp's BIGINT contract must survive the decimal widening")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect1 = BigInt(85) * (BigInt(big) * n) / 100 + Base
    assert(expect1.isValidLong && expect1.toLong > Long.MaxValue / 2,
      "the fixture must actually exceed the old in-round bound")
    assert(got(1L) === expect1.toLong)
    (2L to n.toLong).foreach(v => assert(got(v) === Base,
      s"in-degree-0 node $v must hold the teleport base"))
  }

  test("srpBits covers the advertised 100 TB corpus scale and refuses past the 34-bit ceiling, loudly") {
    // the old 24-bit ceiling capped the family at 128·2²⁴ ≈ 2.1·10⁹
    // vectors — BELOW a 100 TB corpus (≥3·10¹⁰ rows at ~3 KB/row).
    // The advertised scale must now size INSIDE the ceiling…
    assert(VectorQueries.srpBits(30000000000L) === 28,
      "a 3·10¹⁰-vector corpus must size without refusal")
    // …sizing stays monotone and occupancy-pinned across the widened
    // range (n ≤ occ·2^b < 2n at every doubling)…
    (25 to 34).foreach { b =>
      assert(VectorQueries.srpBits(128L << b) === b, s"boundary at $b bits")
      assert(VectorQueries.srpBits((128L << (b - 1)) + 1) === b,
        s"one past the previous boundary must take $b bits")
    }
    // …and past the NEW ceiling's capacity the refusal stays loud,
    // with the remedy in the message
    val e = intercept[IllegalArgumentException](
      VectorQueries.srpBits((128L << 34) + 1))
    assert(e.getMessage.contains("srpMaxBits"), e.getMessage)
    assert(e.getMessage.contains("raise srpMaxBits"), e.getMessage)
  }

  test("label consensus plan: constant-cap neighbor window takes WindowGroupLimit; bucket join stays equi") {
    val p = graft.SparkEntry.queries("sim_label_consensus")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(1200))
  }
}
