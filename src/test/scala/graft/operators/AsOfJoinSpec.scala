package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left timestamp, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0),
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"), // after 10:00 quote
      (1L, ts("2024-01-01 10:05:00"), "t2"), // == 10:05 quote (inclusive)
      (1L, ts("2024-01-01 09:59:00"), "t3"), // before any quote → null
      (2L, ts("2024-01-01 11:00:00"), "t4"), // key 2
      (3L, ts("2024-01-01 10:00:00"), "t5"), // no right rows for key → null
    ).toDF("k", "tts", "trade")

    val out = AsOfJoin.asofLeft(trades, quotes, Seq("k"), "tts", "qts")
      .select($"trade", $"price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap

    assert(out("t1") === Some(100.0))
    assert(out("t2") === Some(101.0)) // inclusive >= semantics
    assert(out("t3") === None)
    assert(out("t4") === Some(200.0))
    assert(out("t5") === None)
  }

  test("left row count is preserved (left-join semantics)") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-02 00:00:00"), "b")).toDF("k", "lts", "v")
    val right = Seq((1L, ts("2024-01-01 12:00:00"), 1.0)).toDF("k", "rts", "x")
    assert(AsOfJoin.asofLeft(left, right, Seq("k"), "lts", "rts").count() === 2)
  }

  test("native physical operator matches the composed form on fixtures and real events") {
    import graft.plans.NativeAsOfJoin
    // fixture with nulls, inclusive ties, and keys absent on one side
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0),
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"),
      (1L, ts("2024-01-01 10:05:00"), "t2"),
      (1L, ts("2024-01-01 09:59:00"), "t3"),
      (3L, ts("2024-01-01 10:00:00"), "t5"),
    ).toDF("k", "tts", "trade")
    val native = NativeAsOfJoin.asofLeft(trades, quotes, Seq("k"), "tts", "qts")
    val composed = AsOfJoin.asofLeft(trades, quotes, Seq("k"), "tts", "qts")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)

    // real events at sf0.001: purchases as-of views, both implementations
    val ev = graft.ops.Tables.loadEvents(spark, sf("0.001"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("view_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val n = NativeAsOfJoin.asofLeft(purchases, views, Seq("user_id"), "ts", "ts")
      .select("user_id", "purchase_id", "view_id")
    val c = AsOfJoin.asofLeft(purchases, views, Seq("user_id"), "ts", "ts")
      .select("user_id", "purchase_id", "view_id")
    assert(n.count() === purchases.count())
    assert(n.exceptAll(c).isEmpty && c.exceptAll(n).isEmpty)
    // the custom operator is actually in the plan (nodeName strips "Exec")
    assert(n.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }
}
