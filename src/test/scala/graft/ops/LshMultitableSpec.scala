package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** `sim_lsh_multitable` checked against a driver-side reconstruction
  * of the 4-table candidate union on the tiny corpus (the DuckDB
  * oracle pins cross-engine equality; this pins the SEMANTICS), plus
  * the property the operator exists for: table 0 is
  * `sim_lsh_bucketed`'s table, so the single-table result must embed
  * in the multi-table result — recall is bought, never traded.
  */
class LshMultitableSpec extends SparkTestBase {

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

  test("sim_lsh_multitable matches a driver-side 4-table union; single-table embeds") {
    val dir = sf("0.001")
    graft.plans.VectorHofRewrite.install(spark)
    val e = Tables.load(spark, dir, "embeddings")
    val bits = VectorQueries.srpBits(e.count())

    // per-seed bucket assignment via the ENGINE's own expression (the
    // plane arithmetic is already bit-pinned in VectorFunctionsSpec);
    // the union/dedup/score semantics are folded here independently
    val seeds = (0 until 4).map(t => 42L + 7919L * t)
    val bySeed = seeds.map { s =>
      e.select(col("vec_id"),
          graft.functions.VectorFunctions
            .srpBucket(col("embedding"), bits, seed = s).as("bucket"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val vecs = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val ids = vecs.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      if bySeed.exists(m => m(a) == m(b))
      s = cos(vecs(a), vecs(b)) if s >= 0.3
    } yield (a, b) -> s).toMap

    val got = graft.SparkEntry.queries("sim_lsh_multitable")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, s) =>
      assert(java.lang.Double.doubleToRawLongBits(s) ===
        java.lang.Double.doubleToRawLongBits(expected(k)), s"score mismatch at $k")
    }

    // table 0 == sim_lsh_bucketed's table: strict containment, and the
    // extra tables must actually surface extra neighbors on this corpus
    val single = graft.SparkEntry.queries("sim_lsh_bucketed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(got.keySet), "single-table pairs must embed")
    assert(got.size > single.size, "L=4 must add recall over L=1 here")
  }

  test("measured recall contract: L=4 recall over the exact calibrator pairs dominates L=1") {
    // The quantitative claim the operator exists for (r16 verdict item
    // 6): against the EXACT ground truth — `dedup_embedding_cosine`'s
    // calibrator pairs (per-label exhaustive at this corpus size: every
    // label block is far under the 512 draw cap, and its ≥0.4 pairs all
    // clear the LSH queries' ≥0.3 score gate) — the 4-table union's
    // recall must be ≥ the single table's, with both MEASURED numbers
    // on record, not just the structural containment.
    val dir = sf("0.001")
    val truth = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "empty ground truth cannot measure recall")
    val single = graft.SparkEntry.queries("sim_lsh_bucketed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = graft.SparkEntry.queries("sim_lsh_multitable")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rSingle = (truth & single).size.toDouble / truth.size
    val rMulti = (truth & multi).size.toDouble / truth.size
    info(f"recall over ${truth.size} exact pairs: single-table $rSingle%.4f, 4-table $rMulti%.4f")
    println(f"[lsh-recall] exact pairs=${truth.size} single=$rSingle%.4f multi=$rMulti%.4f")
    assert(rMulti >= rSingle,
      f"4-table recall $rMulti%.4f must dominate single-table $rSingle%.4f")
    assert(rMulti > 0.0, "the multi-table recall must be measurable (> 0)")
  }
}
