package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** `curate_classifier_score` checked against an independent
  * driver-side retrain + rescore on the tiny corpus (the DuckDB
  * oracle pins cross-engine equality; this pins the SEMANTICS — what
  * the training split, the smoothing, and the join-dropped unseen
  * buckets compute — independently of both engines), plus the scale
  * pins: the weight table is a persisted storage artifact consumed
  * through a broadcast join, with no UDF anywhere in the path.
  */
class ClassifierScoreSpec extends SparkTestBase {

  private val pos = Set("src0", "src1", "src2", "src3", "src4")

  /** Hashed-bigram buckets of a text — the exact feature stream of
    * [[CurationQueries]]'s clfFeats (split keeps trailing empties,
    * md5 over UTF-8, 6-hex-digit prefix mod 256). */
  private def feats(text: String): Seq[Long] = {
    val t = text.split(" ", -1)
    (0 until t.length - 1).map { i =>
      val bg = t(i) + " " + t(i + 1)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(6), 16) % 256
    }
  }

  test("curate_classifier_score matches a driver-side retrain + rescore") {
    val dir = sf("0.001")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val cp = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cn = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    docs.filter(_._1 % 5 == 0).foreach { case (_, src, text) =>
      feats(text).foreach(b => if (pos(src)) cp(b) += 1 else cn(b) += 1)
    }
    val tp = cp.values.sum
    val tn = cn.values.sum
    // only buckets OBSERVED in training carry a weight row — unseen
    // buckets drop out of the scoring join, exactly like the engine
    val w = (cp.keySet ++ cn.keySet).map(b =>
      b -> ((cp(b) + 1) * 1000000L / (tp + 256) - (cn(b) + 1) * 1000000L / (tn + 256))).toMap

    val expected = docs.map { case (id, src, text) =>
      val fs = feats(text).filter(w.contains)
      val score = fs.map(w).sum
      id -> ((src, fs.size.toLong, score, score > 0))
    }.toMap

    val got = graft.SparkEntry.queries("curate_classifier_score")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got === expected)
    // the gate must actually separate: both decisions present
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "classifier must keep some docs and drop others")
  }

  test("curate_classifier_eval matches a driver-side confusion fold on held-out docs") {
    val dir = sf("0.001")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val cp = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cn = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    docs.filter(_._1 % 5 == 0).foreach { case (_, src, text) =>
      feats(text).foreach(b => if (pos(src)) cp(b) += 1 else cn(b) += 1)
    }
    val tp0 = cp.values.sum
    val tn0 = cn.values.sum
    val w = (cp.keySet ++ cn.keySet).map(b =>
      b -> ((cp(b) + 1) * 1000000L / (tp0 + 256) - (cn(b) + 1) * 1000000L / (tn0 + 256))).toMap

    var (tp, fp, fn, tn) = (0L, 0L, 0L, 0L)
    docs.filter(_._1 % 5 != 0).foreach { case (_, src, text) =>
      val pred = feats(text).filter(w.contains).map(w).sum > 0
      val actual = pos(src)
      if (pred && actual) tp += 1
      else if (pred && !actual) fp += 1
      else if (!pred && actual) fn += 1
      else tn += 1
    }
    val row = graft.SparkEntry.queries("curate_classifier_eval")(spark, dir)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((tp, fp, fn, tn)))
    assert(row.getLong(4) === (if (tp + fp == 0) 0L else tp * 1000000L / (tp + fp)))
    assert(row.getLong(5) === (if (tp + fn == 0) 0L else tp * 1000000L / (tp + fn)))
    // the scorecard must be non-degenerate on this corpus: the
    // held-out split contains both classes and some kept docs
    assert(tp + fn > 0 && fp + tn > 0 && tp + fp > 0)
  }

  test("curate_classifier_pr_curve matches a driver-side sweep and is coherent") {
    val dir = sf("0.001")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    val cp = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val cn = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    docs.filter(_._1 % 5 == 0).foreach { case (_, src, text) =>
      feats(text).foreach(b => if (pos(src)) cp(b) += 1 else cn(b) += 1)
    }
    val tp0 = cp.values.sum
    val tn0 = cn.values.sum
    val w = (cp.keySet ++ cn.keySet).map(b =>
      b -> ((cp(b) + 1) * 1000000L / (tp0 + 256) - (cn(b) + 1) * 1000000L / (tn0 + 256))).toMap

    val held = docs.filter(_._1 % 5 != 0).map { case (_, src, text) =>
      (feats(text).filter(w.contains).map(w).sum, pos(src))
    }
    val expected = (-8 to 7).map(_ * 10000L).map { thr =>
      val tp = held.count { case (s, a) => s > thr && a }.toLong
      val fp = held.count { case (s, a) => s > thr && !a }.toLong
      val fn = held.count { case (s, a) => s <= thr && a }.toLong
      val tn = held.count { case (s, a) => s <= thr && !a }.toLong
      thr -> ((tp, fp, fn, tn,
        if (tp + fp == 0) 0L else tp * 1000000L / (tp + fp),
        if (tp + fn == 0) 0L else tp * 1000000L / (tp + fn)))
    }.toMap

    val got = graft.SparkEntry.queries("curate_classifier_pr_curve")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)

    // curve coherence: as the threshold rises, kept docs (tp+fp) can
    // only shrink and recall's numerator (tp) is non-increasing
    val byThr = got.toSeq.sortBy(_._1).map(_._2)
    byThr.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi._1 <= lo._1, "tp must be non-increasing in the threshold")
      assert(hi._1 + hi._2 <= lo._1 + lo._2, "keeps must be non-increasing")
    }
    // the threshold-0 row's confusion must equal curate_classifier_eval's
    val eval = graft.SparkEntry.queries("curate_classifier_eval")(spark, dir)
      .collect().head
    assert(got(0L) === ((eval.getLong(0), eval.getLong(1), eval.getLong(2),
      eval.getLong(3), eval.getLong(4), eval.getLong(5))))
    // the sweep must actually move the operating point on this corpus
    assert(byThr.map(_._1).distinct.size > 1, "a flat curve measures nothing")

    // AUC: exact integer trapezoid over the same 16 points, matching
    // the one-row curate_classifier_pr_auc summary
    val expAuc = byThr.sliding(2).map { case Seq(a, b) =>
      (a._6 - b._6) * (a._5 + b._5) / 2
    }.sum
    val auc = graft.SparkEntry.queries("curate_classifier_pr_auc")(spark, dir)
      .collect().head
    assert(auc.getLong(0) === expAuc, "auc_ppm2 mismatch vs driver trapezoid")
    assert(auc.getLong(1) === 15L, "16 points must yield 15 segments")
    assert(expAuc > 0L, "a degenerate zero-area curve measures nothing")
  }

  test("classifier scoring: persisted weights broadcast-join, no UDF") {
    val df = graft.SparkEntry.queries("curate_classifier_score")(spark, sf("0.001"))
    val p = df.queryExecution.executedPlan.toString
    // weights come from the persisted TxLog artifact, not a literal
    assert(p.contains("clf_weights_"), p.take(1500))
    // ≤256-row model side joins as a broadcast, never a shuffle
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // the whole feature + scoring path is expressions (codegen), no UDF
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), p.take(1500))
  }
}
