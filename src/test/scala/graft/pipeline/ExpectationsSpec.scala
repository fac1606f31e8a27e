package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Quarantine-gated ingest: clean/violating rows route to the right
  * TxLog tables, nothing is lost or duplicated, and the exactly-once
  * txn identity covers both sides. */
class ExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    "id_pos" -> (col("id") > 0),
    "v_short" -> (length(col("v")) <= 3))

  test("split-commit partitions the batch exactly; reasons are sorted and complete") {
    val main = TxLog(spark, tmpDir("exp_main"))
    val quar = TxLog(spark, tmpDir("exp_quar"))
    val batch = Seq((1L, "ok"), (-2L, "bad"), (3L, "looong"), (-4L, "worst")
      ).toDF("id", "v")
    val (vg, vb) = Expectations.appendWithQuarantine(main, quar, batch, rules)
    assert(vg === Some(0L) && vb === Some(0L))
    assert(main.snapshot().collect().map(_.getLong(0)).toSet === Set(1L))
    val q = quar.snapshot().collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(q === Map(-2L -> "id_pos", 3L -> "v_short", -4L -> "id_pos;v_short"))
    // main + quarantine = batch, no loss, no dup
    assert(main.snapshot().count() + quar.snapshot().count() === batch.count())
  }

  test("a fully-clean batch leaves the quarantine table's version untouched") {
    val main = TxLog(spark, tmpDir("exp_clean_main"))
    val quar = TxLog(spark, tmpDir("exp_clean_quar"))
    val (vg, vb) = Expectations.appendWithQuarantine(main, quar,
      Seq((1L, "a")).toDF("id", "v"), rules)
    assert(vg === Some(0L) && vb === None)
    assert(!quar.exists())
  }

  test("null predicate results pass (SQL CHECK convention)") {
    val main = TxLog(spark, tmpDir("exp_null_main"))
    val quar = TxLog(spark, tmpDir("exp_null_quar"))
    val batch = Seq((Some(5L), None: Option[String])).toDF("id", "v")
    val (vg, vb) = Expectations.appendWithQuarantine(main, quar, batch, rules)
    assert(vg === Some(0L) && vb === None)
  }

  test("redelivered batches are exactly-once on BOTH tables") {
    val main = TxLog(spark, tmpDir("exp_txn_main"))
    val quar = TxLog(spark, tmpDir("exp_txn_quar"))
    val batch = Seq((1L, "ok"), (-2L, "bad")).toDF("id", "v")
    Expectations.appendWithQuarantine(main, quar, batch, rules, txn = Some(("app", 1L)))
    // redelivery: same txn id — no duplicates anywhere
    Expectations.appendWithQuarantine(main, quar, batch, rules, txn = Some(("app", 1L)))
    assert(main.snapshot().count() === 1 && quar.snapshot().count() === 1)
  }

  test("property: tagging partitions any batch exactly, reasons match per-row evaluation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextLong() % 100, rnd.alphanumeric.take(rnd.nextInt(6)).mkString))
    val df = rows.toDF("id", "v")
    val tagged = Expectations.tag(df, rules).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(tagged.length === rows.length)
    tagged.foreach { case (id, v, viol) =>
      val expect = Seq(
        if (!(id > 0)) Some("id_pos") else None,
        if (!(v.length <= 3)) Some("v_short") else None).flatten.sorted.mkString(";")
      assert(viol === expect, s"row ($id, $v)")
    }
  }

  test("expectations compose with hard CHECK constraints downstream") {
    // the soft gate routes violators aside; the hard constraint on the
    // main table is then never tripped by this feed
    val main = TxLog(spark, tmpDir("exp_hard_main"),
      checkConstraints = Seq("id_pos" -> "id > 0"))
    val quar = TxLog(spark, tmpDir("exp_hard_quar"))
    val batch = Seq((1L, "ok"), (-2L, "bad")).toDF("id", "v")
    val (vg, vb) = Expectations.appendWithQuarantine(main, quar, batch, rules)
    assert(vg === Some(0L) && vb === Some(0L))
  }
}
