package graft.streaming

import graft.pipeline.TxLog
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Structured-Streaming SOURCE over a [[TxLog]] table — `spark
  * .readStream.format("graft-txlog").option("path", root).load()`
  * tails the transaction log with VERSION-based offsets, the way
  * Delta's streaming source tails its log (reference:
  * `gold_dim_branch.ipynb` consumes recomputed gold each run; a
  * streaming tail is that loop's 100 TB shape — each trigger reads
  * only the newly committed bytes, never the table).
  *
  * Built on the v1 `Source`/`StreamSourceProvider` API — the API
  * Delta's own source uses — because `getBatch` returns a DataFrame:
  * each microbatch is a fully distributed plan over exactly the dirs
  * the tailed commits added (or the change feed's pruned diff), with
  * no custom row readers.
  *
  * Options:
  *  - `path` (required): TxLog table root.
  *  - `readChangeFeed` (default false): emit row-level CDF rows
  *    (`_change_type`, `_commit_version`) via [[TxLog.changes]]
  *    instead of appended rows — rewriting commits (merge / delete /
  *    overwrite) stream as classified changes.
  *  - `keys`: comma-separated key columns (required with
  *    `readChangeFeed` — the feed classifies rows by key identity).
  *  - `skipChangeCommits` (default false): in append mode, silently
  *    skip rewriting commits instead of failing the stream (Delta's
  *    option of the same name).
  *  - `startingVersion`: first commit to stream, INCLUSIVE (Delta's
  *    semantics). Append mode default: batch 0 is the full snapshot at
  *    the stream's start offset, then pure tailing (Delta's default).
  *    CDF mode default: 1 — v0 is the table seed; `startingVersion=0`
  *    streams it too, as inserts at commit 0.
  *  - `startingTimestamp`: timestamp form of `startingVersion`
  *    (Delta's option of the same name) — resolves to the FIRST
  *    commit at-or-after the instant on the [[TxLog.commitInstant]]
  *    clock (the recorded in-commit timestamp where the table runs
  *    under `graft.inCommitTimestamps`). Mutually exclusive with
  *    `startingVersion`.
  *  - `maxVersionsPerTrigger`: cap each microbatch at N commits
  *    (Delta's `maxFilesPerTrigger` analogue); with `startingVersion`
  *    it paces the backfill too.
  *
  * Offset semantics: offset N = "committed through version N". A batch
  * (start, end] replays deterministically from the manifests, so
  * checkpoint recovery re-produces the identical batch; end-to-end
  * exactly-once composes with a `foreachBatch` sink committing
  * `TxLog.append(df, txn = Some((app, batchId)))`.
  */
class TxLogStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-txlog"

  /** Native streaming SINK — `df.writeStream.format("graft-txlog")
    * .option("path", root).start()`, completing the symmetric
    * streaming story (Delta writes to its own log the same way).
    * Output modes:
    *   - Append → [[TxLog.append]]
    *   - Update → [[TxLog.merge]] on the REQUIRED `keys` option (each
    *     microbatch upserts its changed keys — the aggregation-stream
    *     shape)
    *   - Complete → refused (each trigger would rewrite the whole
    *     result; materialize via foreachBatch + overwrite if that is
    *     really wanted)
    *
    * EXACTLY-ONCE: every batch commits with a `#txn` (appId, batchId)
    * mark, appId = the query's checkpoint location (stable across
    * restarts, unique per sink — Delta's txnAppId convention), so a
    * redelivered microbatch after crash-recovery is a version-level
    * no-op. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-txlog sink requires option 'path' (the TxLog table root)"))
    val keys = parameters.get("keys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-txlog sink requires a checkpointLocation (or explicit " +
          "txnAppId) — it is the exactly-once transaction identity"))
    import org.apache.spark.sql.streaming.OutputMode
    outputMode match {
      case m if m == OutputMode.Append() =>
        new TxLogSink(sqlContext.sparkSession, root, appId, None)
      case m if m == OutputMode.Update() =>
        require(keys.nonEmpty, "graft-txlog sink in Update mode requires " +
          "option 'keys' (comma-separated merge keys)")
        new TxLogSink(sqlContext.sparkSession, root, appId, Some(keys))
      case _ => throw new IllegalArgumentException(
        "graft-txlog sink supports Append and Update(keys) output modes; " +
          "Complete would rewrite the table every trigger — use foreachBatch")
    }
  }

  private def build(sqlContext: SQLContext,
                    parameters: Map[String, String]): TxLogSource = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-txlog source requires option 'path' (the TxLog table root)"))
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    val keys = parameters.get("keys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(!cdf || keys.nonEmpty,
      "graft-txlog: readChangeFeed=true requires option 'keys' " +
        "(comma-separated key columns — the feed classifies by key identity)")
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graft-txlog: startingVersion and startingTimestamp are mutually " +
        "exclusive (Delta's contract)")
    val startVer = parameters.get("startingVersion").map(_.toLong)
      .orElse(parameters.get("startingTimestamp").map { ts =>
        val millis =
          if (ts.trim.length <= 10) java.sql.Date.valueOf(ts.trim).getTime
          else java.sql.Timestamp.valueOf(ts.trim).getTime
        graft.pipeline.TxLog(sqlContext.sparkSession, root)
          .versionAtOrAfter(millis)
      })
    new TxLogSource(sqlContext.sparkSession, root, cdf, keys,
      skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean),
      startingVersion = startVer,
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toInt))
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), build(sqlContext, parameters).schema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    build(sqlContext, parameters)
}

class TxLogSource(spark: SparkSession, root: String, readChangeFeed: Boolean,
                  keys: Seq[String], skipChangeCommits: Boolean,
                  startingVersion: Option[Long],
                  maxVersionsPerTrigger: Option[Int] = None)
    extends Source with SupportsTriggerAvailableNow {

  private val t = TxLog(spark, root)
  require(t.exists(), s"graft-txlog: no committed TxLog table at $root")
  require(maxVersionsPerTrigger.forall(_ > 0),
    "graft-txlog: maxVersionsPerTrigger must be positive")

  /** Trigger.AvailableNow (the FileStreamSource pattern): pin the
    * version visible at query start; batches drain up to the pin and
    * the query terminates even while writers keep committing. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(t.currentVersion())

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger
      .map(n => TxLogSource.MaxVersions(n): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control: `maxVersionsPerTrigger` bounds each
    * microbatch to N commits (Delta's `maxFilesPerTrigger` analogue —
    * a backfill over a long history drains in paced batches instead of
    * one giant plan). Under Trigger.AvailableNow the pace still drains
    * to the pinned cap, just across several batches. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val avail = availableNowCap.getOrElse(t.currentVersion())
    if (avail < 0) return null
    val capped = limit match {
      case TxLogSource.MaxVersions(n) =>
        // batch base: the committed offset, or (startingVersion-1) on
        // the very first batch so the limit paces a backfill too; an
        // unset startingVersion first-batches the whole snapshot.
        Option(start).map(o => o.json.trim.toLong)
          .orElse(startingVersion.map(_ - 1))
          .map(from => math.min(avail, from + n)).getOrElse(avail)
      case _ => avail
    }
    LongOffset(capped)
  }
  override def reportLatestOffset(): OffsetV2 = {
    val v = t.currentVersion()
    if (v < 0) null else LongOffset(v)
  }

  /** Fixed for the stream's lifetime, computed from the start-time
    * snapshot (a later schema-evolving append's new columns are not
    * retro-added — conform() pads older frames with typed nulls and
    * drops columns the declared schema lacks, Delta's behavior short
    * of a schema-change stream restart). CDF order matches
    * [[TxLog.changes]]' natural `keys ++ values` output. */
  override val schema: StructType = {
    val snap = t.snapshot().schema
    keys.foreach(k => require(snap.fieldNames.contains(k),
      s"graft-txlog: key '$k' is not a column of the table at $root"))
    if (!readChangeFeed) snap
    else StructType(
      (keys ++ snap.fieldNames.filterNot(keys.contains)).map(n =>
        StructField(n, snap(n).dataType, nullable = true)) ++
        Seq(StructField("_change_type", StringType, nullable = true),
          StructField("_commit_version", LongType, nullable = true)))
  }

  /** Engine-agnostic offset decode: `LongOffset.json` and a
    * checkpoint-recovered `SerializedOffset.json` are both the bare
    * version number. */
  private def ver(o: OffsetV1): Long = o.json.trim.toLong

  override def getOffset: Option[OffsetV1] = {
    val v = t.currentVersion()
    if (v < 0) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = ver(end)
    val batch =
      if (readChangeFeed)
        // offsets mean "committed THROUGH version N", so the resumed
        // window opens at start+1; a fresh stream opens at
        // startingVersion itself — INCLUSIVE, Delta's semantics (the
        // changes() window is [from, to]; from = end+1 is the legal
        // empty already-caught-up batch). Default startingVersion = 1:
        // v0 is the table seed, streamed only on explicit request
        // (startingVersion=0 serves it as inserts at commit 0).
        t.changes(start.map(ver(_) + 1).getOrElse(startingVersion.getOrElse(1L)),
          endV, keys)
      else (start.map(ver), startingVersion) match {
        case (Some(s), _) => appendRows(s + 1, endV)
        case (None, Some(sv)) => appendRows(sv, endV)
        case (None, None) => t.snapshot(endV) // existing table = batch 0
      }
    GraftSqlBridge.streamingFrame(spark, conform(batch))
  }

  /** Append-mode tail of commits [from, to]: each must be append-only
    * ([[TxLog.appendedAt]]); rewriting commits fail the stream with
    * the remedy spelled out, or are skipped under `skipChangeCommits`. */
  private def appendRows(from: Long, to: Long): DataFrame =
    (from to to).flatMap { v =>
      t.appendedAt(v) match {
        case Right(df) => Some(df)
        case Left(_) if skipChangeCommits => None
        case Left(why) => throw new IllegalStateException(
          s"graft-txlog stream at $root: $why. A streaming tail requires " +
            "append-only commits — set skipChangeCommits=true to skip " +
            "rewriting commits, or readChangeFeed=true to stream them as " +
            "row-level changes")
      }
    }.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(t.snapshot(to).filter(lit(false)))

  private def conform(df: DataFrame): DataFrame =
    schema.fields.foldLeft(df)((acc, f) =>
      if (acc.columns.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType)))
      .select(schema.fieldNames.map(col).toSeq: _*)

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
}

object TxLogSource {
  /** Custom ReadLimit carrying the per-trigger commit budget — the
    * engine treats ReadLimit opaquely and hands it back to
    * [[TxLogSource.latestOffset]]. */
  private[streaming] case class MaxVersions(n: Int) extends ReadLimit
}

/** v1 streaming Sink over a [[TxLog]] table. Each microbatch commits
  * once: append (or keyed merge in Update mode) with a `#txn`
  * (appId, batchId) mark — a redelivered batch after crash recovery
  * returns the recorded version and writes nothing, the same
  * exactly-once contract the foreachBatch pattern spells by hand.
  * `addBatch`'s incoming frame is STREAMING-tagged; it re-roots as a
  * batch plan ([[GraftSqlBridge.batchFrame]] — the Delta sink
  * technique), so the write is the microbatch's own distributed plan,
  * never a driver materialization. */
class TxLogSink(spark: SparkSession, root: String, appId: String,
                mergeKeys: Option[Seq[String]])
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long,
                       data: org.apache.spark.sql.DataFrame): Unit = {
    val t = TxLog(spark, root)
    val batch = GraftSqlBridge.batchFrame(spark, data)
    val txn = Some((appId, batchId))
    mergeKeys match {
      case Some(keys) =>
        // Update mode re-emits CHANGED keys per trigger; first batch
        // on a fresh table seeds it (merge needs an existing snapshot)
        if (t.exists()) t.merge(batch, keys, txn = txn)
        else t.append(batch, txn = txn)
      case None => t.append(batch, txn = txn)
    }
    ()
  }

  override def toString: String = s"TxLogSink[$root]"
}
