package graft.streaming

import graft.SparkTestBase
import graft.pipeline.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once for the streaming→TxLog ingest: foreachBatch may
  * REDELIVER a batch whose commit landed but whose checkpoint offset
  * write did not (crash between the two). The commit path must treat
  * the redelivered (appId, batchId) as already applied. */
class StreamExactlyOnceSpec extends SparkTestBase {

  // an update-mode microbatch of the hourly aggregation: (hour_start,
  // event_type, n_events, total_value, event_date)
  private def batch(rows: Seq[(String, String, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("h", "event_type", "n_events", "total_value")
      .withColumn("hour_start", col("h").cast("timestamp")).drop("h")
      .withColumn("event_date", to_date(col("hour_start")))
      .select("hour_start", "event_type", "n_events", "total_value", "event_date")
  }

  test("a killed-and-restarted replay (redelivered batches) equals the clean run") {
    // three microbatches; batch 1 UPDATES an hour batch 0 created
    // (cumulative update-mode emission), so a double-merge of a stale
    // redelivery would regress the hour's totals
    val b0 = batch(Seq(("2024-01-01 00:00:00", "view", 5L, 10.0)))
    val b1 = batch(Seq(("2024-01-01 00:00:00", "view", 9L, 18.0),
      ("2024-01-01 01:00:00", "click", 2L, 4.0)))
    val b2 = batch(Seq(("2024-01-01 01:00:00", "click", 7L, 14.0)))

    val clean = TxLog(spark, tmpDir("stream_eo_clean"))
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      EventStreams.commitHourlyBatch(clean, b, i.toLong)
    }

    // faulty run: crash after batch 1's commit → restart redelivers
    // batch 1, then proceeds; a second crash redelivers batch 2
    val faulty = TxLog(spark, tmpDir("stream_eo_faulty"))
    EventStreams.commitHourlyBatch(faulty, b0, 0L)
    EventStreams.commitHourlyBatch(faulty, b1, 1L)
    EventStreams.commitHourlyBatch(faulty, b1, 1L) // redelivered
    EventStreams.commitHourlyBatch(faulty, b2, 2L)
    EventStreams.commitHourlyBatch(faulty, b2, 2L) // redelivered

    def state(t: TxLog) = t.snapshot()
      .select(col("hour_start").cast("string"), col("event_type"),
        col("n_events"), col("total_value"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(state(faulty) === state(clean))
    // and no version churn: redeliveries committed NOTHING
    assert(faulty.currentVersion() === clean.currentVersion())
  }
}
