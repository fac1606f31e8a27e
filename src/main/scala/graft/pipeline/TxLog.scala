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

  /** Data dirs referenced by `version`'s snapshot (default: latest) —
    * exposed so a catalog layer can point SQL registrations at a
    * single-dir snapshot directly. */
  def snapshotDataDirs(version: Long = -1L): Seq[String] = {
    val v = if (version >= 0) version else currentVersion()
    require(v >= 0, s"TxLog table at $root has no commits")
    readManifest(v).map(d => s"$dataDir/$d")
  }

  /** Snapshot read of `version` (default: latest). Fails on an empty
    * table — callers use [[exists]] for the initial-load branch. */
  def snapshot(version: Long = -1L): DataFrame =
    spark.read.parquet(snapshotDataDirs(version): _*) // manifests always reference ≥1 dir

  /** Write `df` fully into a fresh uuid data dir (no manifest yet —
    * unreferenced dirs are invisible to readers and GC'd by vacuum). */
  private def writeDataDir(df: DataFrame): String = {
    val uuid = java.util.UUID.randomUUID().toString
    df.write.mode("overwrite").parquet(s"$dataDir/$uuid")
    uuid
  }

  /** Attempt to commit `lines` as EXACTLY `version`'s manifest.
    * Rename-if-absent is the atomic primitive (true on HDFS/local;
    * object stores use a DynamoDB-style lock in production — same
    * contract as delta-on-S3): a concurrent winner makes the
    * destination exist and the rename return false. Returns whether
    * THIS writer won `version`. */
  private def tryCommitManifest(version: Long, lines: Seq[String]): Boolean = {
    val tmp = new Path(s"$logDir/_tmp_${java.util.UUID.randomUUID()}")
    fs.mkdirs(new Path(logDir))
    val out = fs.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    val won = !fs.exists(manifestPath(version)) &&
      fs.rename(tmp, manifestPath(version))
    if (!won) fs.delete(tmp, true)
    won
  }

  private val MaxRaceRetries = 5

  /** Overwrite-style commit: the new snapshot is exactly `df`. The
    * payload is independent of the previous snapshot, so losing an
    * optimistic race only slides the version number. */
  def overwrite(df: DataFrame): Long = {
    val uuid = writeDataDir(df)
    var attempt = 0
    while (attempt < MaxRaceRetries) {
      val next = currentVersion() + 1
      if (tryCommitManifest(next, Seq(uuid))) return next
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog overwrite lost $MaxRaceRetries optimistic races at $root")
  }

  /** Append-style commit: previous snapshot stays live, `df` adds.
    * The carried-over dir list is re-read INSIDE the retry loop — a
    * loser that recommitted its pre-race view would silently drop the
    * winner's data (lost update); re-reading makes concurrent appends
    * serialize losslessly (pinned by the TxLogSpec race test). */
  def append(df: DataFrame): Long = {
    val uuid = writeDataDir(df)
    var attempt = 0
    while (attempt < MaxRaceRetries) {
      val cur = currentVersion()
      val prev = if (cur >= 0) readManifest(cur) else Seq.empty
      if (tryCommitManifest(cur + 1, prev :+ uuid)) return cur + 1
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog append lost $MaxRaceRetries optimistic races at $root")
  }

  /** SCD1 MERGE commit: upsert `src` by `keys` against the current
    * snapshot (same semantics as [[Upsert.merge]]) and commit the
    * merged relation as a fresh single-dir snapshot — the rewrite
    * doubles as compaction, exactly what `DeltaTable.merge` +
    * OPTIMIZE achieve on the reference's gold tables.
    *
    * Optimistic TRANSACTION, not just an optimistic rename: the merge
    * result depends on the snapshot it read, so on losing the version
    * race the whole merge recomputes against the new snapshot (the
    * stale merged dir is abandoned to vacuum). Committing the stale
    * result at a later version would undo the winner's changes —
    * Delta raises ConcurrentModification here; we re-merge, which is
    * equivalent to retrying the transaction. */
  def merge(src: DataFrame, keys: Seq[String]): Long = {
    var attempt = 0
    while (attempt < MaxRaceRetries) {
      val base = currentVersion()
      require(base >= 0, s"TxLog table at $root has no commits to merge into")
      // materialize before the commit swaps the snapshot out from
      // under the plan (merged reads the base snapshot's files)
      val merged = Upsert.merge(snapshot(base), src, keys).localCheckpoint(true)
      val uuid = writeDataDir(merged)
      if (tryCommitManifest(base + 1, Seq(uuid))) return base + 1
      attempt += 1
    }
    throw new java.io.IOException(
      s"TxLog merge lost $MaxRaceRetries optimistic races at $root")
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
