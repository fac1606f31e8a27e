package graft.streaming

import graft.SparkTestBase
import graft.pipeline.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** The graft-txlog streaming SOURCE: version-offset tailing, snapshot
  * batch 0, checkpoint-resume exactly-once into a TxLog sink,
  * rewrite-commit semantics (fail / skipChangeCommits), and the
  * readChangeFeed mode's equivalence with batch [[TxLog.changes]]. */
class TxLogStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def table(name: String): TxLog = TxLog(spark, tmpDir(name))

  /** One Trigger.AvailableNow run of the source over `root`, folded
    * into `sink` exactly-once via the manifest txn high-water mark. */
  private def runOnce(root: String, sink: TxLog, checkpoint: String,
                      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-txlog").option("path", root)
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.append(batch, txn = Some(("txlog_stream_spec", batchId)))
        ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }

  test("tail: snapshot batch 0, then append-only microbatches; " +
    "checkpoint resume is exactly-once") {
    val t = table("stream_tail")
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "s"))      // v0
    t.append(Seq((3, "c")).toDF("k", "s"))                   // v1
    val sink = table("stream_tail_sink")
    sink.overwrite(Seq.empty[(Int, String)].toDF("k", "s"))
    val ckpt = tmpDir("stream_tail_ckpt")

    runOnce(t.root, sink, ckpt) // batch 0 = full snapshot through v1
    assert(sink.snapshot().as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))

    t.append(Seq((4, "d"), (5, "e")).toDF("k", "s"))         // v2
    t.append(Seq((6, "f")).toDF("k", "s"))                   // v3
    runOnce(t.root, sink, ckpt) // resume: ONLY v2+v3 rows
    runOnce(t.root, sink, ckpt) // no new commits: nothing re-emitted
    assert(sink.snapshot().as[(Int, String)].collect().toSet ===
      (1 to 6).map(i => (i, ('a' + i - 1).toChar.toString)).toSet)
    assert(sink.snapshot().count() === 6L) // exactly-once: no dups
  }

  test("a rewriting commit fails the append-mode tail with the remedy") {
    val t = table("stream_fail")
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))        // v0
    val sink = table("stream_fail_sink")
    sink.overwrite(Seq.empty[(Int, Int)].toDF("k", "v"))
    val ckpt = tmpDir("stream_fail_ckpt")
    runOnce(t.root, sink, ckpt)                              // through v0
    t.deleteWhere("k = 1")                                   // v1: rewrite
    val e = intercept[StreamingQueryException] {
      runOnce(t.root, sink, ckpt)
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("skipChangeCommits")))
  }

  test("skipChangeCommits skips the rewrite and keeps tailing appends") {
    val t = table("stream_skip")
    t.overwrite(Seq((1, 10), (2, 20)).toDF("k", "v"))        // v0
    val sink = table("stream_skip_sink")
    sink.overwrite(Seq.empty[(Int, Int)].toDF("k", "v"))
    val ckpt = tmpDir("stream_skip_ckpt")
    runOnce(t.root, sink, ckpt)                              // through v0
    t.deleteWhere("k = 1")                                   // v1: skipped
    t.append(Seq((3, 30)).toDF("k", "v"))                    // v2: emitted
    runOnce(t.root, sink, ckpt, Map("skipChangeCommits" -> "true"))
    // the delete is NOT retracted downstream (skip semantics); v2 lands
    assert(sink.snapshot().as[(Int, Int)].collect().toSet ===
      Set((1, 10), (2, 20), (3, 30)))
  }

  test("readChangeFeed stream equals batch changes() across commits") {
    val t = table("stream_cdf")
    t.overwrite(Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
      .toDF("k", "s", "v"))                                  // v0
    t.merge(Seq((2, "b2", 21), (4, "d", 40)).toDF("k", "s", "v"),
      Seq("k"))                                              // v1
    t.deleteWhere("k = 3")                                   // v2
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[Any]]
    val q = spark.readStream.format("graft-txlog")
      .option("path", t.root)
      .option("readChangeFeed", "true")
      .option("keys", "k")
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("stream_cdf_ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got.synchronized { got += batch.collect().map(r => r: Any).toSet }
        ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
    val streamed = got.foldLeft(Set.empty[Any])(_ ++ _)
    // default CDF start is version 1 (v0 = table seed): the stream
    // equals the batch feed over commits [1, 2]
    val expect = t.changes(1, 2, Seq("k"))
      .select("k", "s", "v", "_change_type", "_commit_version")
      .collect().map(r => r: Any).toSet
    // same rows (stream conforms column order to keys-first = batch's)
    assert(streamed === expect)
    assert(streamed.nonEmpty)
  }

  test("CDF stream with startingVersion=0 serves the seed as inserts at commit 0") {
    val t = table("stream_cdf_seed")
    t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "s"))      // v0
    t.deleteWhere("k = 1")                                   // v1
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Int, String, Long)]]
    val q = spark.readStream.format("graft-txlog")
      .option("path", t.root)
      .option("readChangeFeed", "true").option("keys", "k")
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("stream_cdf_seed_ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.select("k", "_change_type", "_commit_version")
          .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
        got.synchronized { got += rows }
        ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
    assert(got.foldLeft(Set.empty[(Int, String, Long)])(_ ++ _) === Set(
      (1, "insert", 0L), (2, "insert", 0L), (1, "delete", 1L)))
  }

  test("maxVersionsPerTrigger paces an AvailableNow drain one commit " +
    "per microbatch, losing nothing") {
    val t = table("stream_paced")
    t.overwrite(Seq((0, "z")).toDF("k", "s"))                // v0
    (1 to 3).foreach(i =>
      t.append(Seq((i, i.toString)).toDF("k", "s")))         // v1..v3
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Int])]
    val q = spark.readStream.format("graft-txlog")
      .option("path", t.root)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("stream_paced_ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ks = batch.select("k").collect().map(_.getInt(0)).toSet
        batches.synchronized { batches += ((id, ks)) }
        ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
    // one commit per microbatch: 4 batches, each a single version's rows
    assert(batches.size === 4)
    assert(batches.map(_._2).toSeq === Seq(Set(0), Set(1), Set(2), Set(3)))
  }

  test("native sink: append mode lands every commit once; a redelivered batch is a no-op") {
    val src = table("nsink_src")
    val dst = tmpDir("nsink_dst")
    val ckpt = tmpDir("nsink_ckpt")
    src.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "s"))    // v0
    src.append(Seq((3, "c")).toDF("k", "s"))                 // v1
    def drain(): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", src.root)
        .load()
        .writeStream.format("graft-txlog").option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    drain()
    val sink = TxLog(spark, dst)
    assert(sink.snapshot().count() === 3)
    // checkpoint-resumed drain with nothing new: no commit, no dup
    val vBefore = sink.currentVersion()
    drain()
    assert(sink.currentVersion() === vBefore && sink.snapshot().count() === 3)
    // new commit, resumed drain: exactly the new rows land
    src.append(Seq((4, "d")).toDF("k", "s"))                 // v2
    drain()
    assert(sink.snapshot().select("k").as[Int].collect().sorted ===
      Array(1, 2, 3, 4))
    // crash redelivery: re-running an ALREADY-COMMITTED batch id under
    // the same txn identity (the checkpoint location) writes nothing
    val lastBatch = new java.io.File(s"$ckpt/commits").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
    val v2 = sink.currentVersion()
    new TxLogSink(spark, dst, ckpt, None)
      .addBatch(lastBatch, Seq((4, "d")).toDF("k", "s"))
    assert(sink.currentVersion() === v2 && sink.snapshot().count() === 4)
  }

  test("native sink: update mode merges changed aggregates on the keys option") {
    val src = table("nsink_upd_src")
    val dst = tmpDir("nsink_upd_dst")
    val ckpt = tmpDir("nsink_upd_ckpt")
    src.overwrite(Seq((1, "g1"), (2, "g1"), (3, "g2")).toDF("id", "g")) // v0
    def drain(): Unit = {
      val q = spark.readStream.format("graft-txlog").option("path", src.root)
        .load()
        .groupBy($"g").agg(count(lit(1)).as("n"))
        .writeStream.format("graft-txlog").option("path", dst)
        .option("keys", "g")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    drain()
    def counts() = TxLog(spark, dst).snapshot()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts() === Map("g1" -> 2L, "g2" -> 1L))
    // more rows: the changed groups re-emit and MERGE over their keys
    src.append(Seq((4, "g1"), (5, "g3")).toDF("id", "g"))    // v1
    drain()
    assert(counts() === Map("g1" -> 3L, "g2" -> 1L, "g3" -> 1L))
  }

  test("native sink: Complete mode and a missing checkpoint are refused with clear errors") {
    val src = table("nsink_err_src")
    src.overwrite(Seq((1, "a")).toDF("k", "s"))
    val e = intercept[Exception] {
      spark.readStream.format("graft-txlog").option("path", src.root).load()
        .groupBy($"s").count()
        .writeStream.format("graft-txlog")
        .option("path", tmpDir("nsink_err_dst"))
        .option("checkpointLocation", tmpDir("nsink_err_ckpt"))
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    assert(e.getMessage.contains("foreachBatch"))
  }

  test("source schema: append mode = snapshot; CDF mode adds feed columns") {
    val t = table("stream_schema")
    t.overwrite(Seq((1, "a")).toDF("k", "s"))
    val plain = spark.readStream.format("graft-txlog")
      .option("path", t.root).load()
    assert(plain.schema.fieldNames.toSeq === Seq("k", "s"))
    assert(plain.isStreaming)
    val cdf = spark.readStream.format("graft-txlog")
      .option("path", t.root).option("readChangeFeed", "true")
      .option("keys", "k").load()
    assert(cdf.schema.fieldNames.toSeq ===
      Seq("k", "s", "_change_type", "_commit_version"))
  }
}
