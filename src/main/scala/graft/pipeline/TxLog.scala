package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log table format — the engine's stand-in for the
  * reference's Delta tables (`gold_dim_branch.ipynb:88162-88175` writes
  * `format('delta')` and merges via `DeltaTable`; no Delta jars exist
  * in this environment, so the commit protocol is reimplemented from
  * first principles on plain parquet + a JSON log).
  *
  * Layout:
  * {{{
  *   <table>/_txlog/00000000.json   // snapshot manifest per version
  *   <table>/data/<uuid>/part-*.parquet
  * }}}
  *
  * Each manifest is a SNAPSHOT (the full list of live data dirs), not a
  * delta of actions — O(versions) storage for the tiny manifests buys
  * O(1) snapshot resolution and inherent compaction on overwrite-style
  * commits (merge rewrites produce a single-dir snapshot).
  *
  * Commit protocol: write the manifest to a temp name, then RENAME to
  * `<version>.json`. Rename-if-absent is the atomic primitive (true on
  * HDFS/local; object stores use a DynamoDB-style lock in production —
  * same contract as delta-on-S3). A losing writer's rename fails
  * because the version file exists → optimistic retry against the new
  * snapshot. Readers list `_txlog` and take the highest version — they
  * never see a half-committed table (the manifest appears atomically,
  * and data files are fully written before the manifest references
  * them).
  *
  * Scale: manifests hold directory names, not per-file entries, so a
  * million-file table costs the same manifest bytes; data stays plain
  * parquet readable by any engine.
  */
final case class TxLog(spark: SparkSession, root: String) {

  private val logDir = s"$root/_txlog"
  private val dataDir = s"$root/data"

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, or -1 for an empty/absent table. */
  def currentVersion(): Long = {
    val p = new Path(logDir)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  def exists(): Boolean = currentVersion() >= 0

  private def manifestPath(v: Long) = new Path(f"$logDir/$v%08d.json")

  private def readManifest(v: Long): Seq[String] = {
    val in = fs.open(manifestPath(v))
    val txt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    // one data-dir name per line (versioned trivial format; a real log
    // would be JSON actions — the commit protocol is the point here)
    txt.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Snapshot read of `version` (default: latest). Fails on an empty
    * table — callers use [[exists]] for the initial-load branch. */
  def snapshot(version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion()
    require(v >= 0, s"TxLog table at $root has no commits")
    val dirs = readManifest(v).map(d => s"$dataDir/$d")
    spark.read.parquet(dirs: _*) // manifests always reference ≥1 dir
  }

  /** Write `df` as a new data dir and commit a snapshot manifest.
    * `carryOver` lists data dirs from the previous snapshot that stay
    * live (append semantics); empty = overwrite semantics. Retries the
    * optimistic commit up to 5 times on version collisions. */
  private def commit(df: DataFrame, carryOver: Seq[String]): Long = {
    val uuid = java.util.UUID.randomUUID().toString
    df.write.mode("overwrite").parquet(s"$dataDir/$uuid")
    val lines = (carryOver :+ uuid).mkString("\n")
    var attempt = 0
    while (attempt < 5) {
      val next = currentVersion() + 1
      val tmp = new Path(s"$logDir/_tmp_$uuid")
      fs.mkdirs(new Path(logDir))
      val out = fs.create(tmp, false)
      try out.write(lines.getBytes("UTF-8")) finally out.close()
      // rename-if-absent IS the commit; a concurrent winner makes the
      // destination exist and the rename return false → retry
      if (!fs.exists(manifestPath(next)) && fs.rename(tmp, manifestPath(next)))
        return next
      fs.delete(tmp, true)
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog commit lost ${5} optimistic races at $root")
  }

  /** Overwrite-style commit: the new snapshot is exactly `df`. */
  def overwrite(df: DataFrame): Long = commit(df, Seq.empty)

  /** Append-style commit: previous snapshot stays live, `df` adds. */
  def append(df: DataFrame): Long = {
    val prev = if (exists()) readManifest(currentVersion()) else Seq.empty
    commit(df, prev)
  }

  /** SCD1 MERGE commit: upsert `src` by `keys` against the current
    * snapshot (same semantics as [[Upsert.merge]]) and commit the
    * merged relation as a fresh single-dir snapshot — the rewrite
    * doubles as compaction, exactly what `DeltaTable.merge` +
    * OPTIMIZE achieve on the reference's gold tables. */
  def merge(src: DataFrame, keys: Seq[String]): Long = {
    require(exists(), s"TxLog table at $root has no commits to merge into")
    val merged = Upsert.merge(snapshot(), src, keys)
    // materialize before the commit swaps the snapshot out from under
    // the plan (merged reads the current snapshot's files)
    commit(merged.localCheckpoint(true), Seq.empty)
  }

  /** Garbage-collect data dirs unreferenced by any of the newest
    * `keepVersions` manifests, and drop older manifests (bounds time
    * travel; the production knob is retention time). */
  def vacuum(keepVersions: Int = 3): Unit = {
    val cur = currentVersion()
    if (cur < 0) return
    val keep = (math.max(0, cur - keepVersions + 1) to cur)
    val live = keep.flatMap(readManifest).toSet
    val dd = new Path(dataDir)
    if (fs.exists(dd)) fs.listStatus(dd).map(_.getPath)
      .filter(p => !live.contains(p.getName))
      .foreach(p => fs.delete(p, true))
    fs.listStatus(new Path(logDir)).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .filter(_.getName.stripSuffix(".json").toLong < keep.head)
      .foreach(p => fs.delete(p, true))
  }
}
