package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The `_txlog/_history` checkpoint sidecar (the `_last_checkpoint`
  * analog for DESCRIBE HISTORY and the cold time-travel clock): a
  * 1,000-commit history must cost one sidecar read + a spot-check +
  * O(commits since the last refresh) header opens — never 1,000 —
  * and the sidecar must be purely advisory: corruption, staleness, or
  * a same-root re-created table change request counts, never results. */
class HistoryCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  /** A table with `n` metadata commits (ICT from commit 1 on). */
  private def build(name: String, n: Int): TxLog = {
    val t = TxLog(spark, tmpDir(s"hist_ckpt_$name"))
    t.overwrite(Seq((1L, "seed")).toDF("id", "v"))
    t.setProperties(Seq(TxLog.IctProp -> "true"))
    (t.currentVersion() + 1 to n).foreach(i =>
      t.setProperties(Seq("tick" -> i.toString)))
    t
  }

  test("1,000-commit DESCRIBE HISTORY: one checkpoint read + O(recent) header opens") {
    val t = build("kilohistory", 1000)
    assert(t.currentVersion() === 1000L)
    // cold process state: no cached instants, no primed markers
    TxLog.instantCache.clear()
    TxLog.purgeMetaCaches(t.root, 0L)
    val before = TxLog.headerReads.get()
    val hist = t.history().collect()
    val opens = TxLog.headerReads.get() - before
    assert(hist.length === 1001)
    // without the sidecar this is 1,001 header opens; with it: the
    // spot-check + the ≤ SidecarEvery versions since the last refresh
    assert(opens <= 2L * TxLog.SidecarEvery + 5,
      s"DESCRIBE HISTORY opened $opens manifest headers on a 1,000-commit table")
    // and the rows are right: newest first, ops recorded, v0 seeded
    assert(hist.head.getLong(0) === 1000L)
    assert(hist.last.getLong(0) === 0L)
    assert(hist.count(_.getString(2).startsWith("SET TBLPROPERTIES")) >= 999)

    // cold TIMESTAMP AS OF: priming from the sidecar replaces the
    // O(log V) header probes with one spot-check + O(recent)
    TxLog.instantCache.clear()
    TxLog.purgeMetaCaches(t.root, 1001L) // drop primed marker, keep nothing stale
    val ts = t.commitInstant(997L)
    TxLog.instantCache.clear()
    val b2 = TxLog.headerReads.get()
    assert(t.versionAsOf(ts) === 997L)
    val coldResolve = TxLog.headerReads.get() - b2
    assert(coldResolve <= TxLog.SidecarEvery + 5,
      s"cold versionAsOf opened $coldResolve headers despite the checkpoint")
  }

  test("sidecar equivalence and advisory-only trust: corruption or staleness never changes results") {
    val t = build("advisory", 60)
    val withSidecar = t.history().collect().map(_.toSeq)
    val sidecar = new java.io.File(s"${t.root}/_txlog/_history")
    assert(sidecar.exists(), "no checkpoint written by the 10th commit")
    // 1) deleted sidecar: identical rows from pure header reads
    val saved = java.nio.file.Files.readAllBytes(sidecar.toPath)
    assert(sidecar.delete())
    assert(t.history().collect().map(_.toSeq).toSeq === withSidecar.toSeq,
      "sidecar-less history differs from checkpointed history")
    // 2) corrupt sidecar: ignored, results identical
    java.nio.file.Files.writeString(sidecar.toPath, "#graftHistory=1\ngarbage")
    assert(t.history().collect().map(_.toSeq).toSeq === withSidecar.toSeq,
      "a corrupt sidecar changed DESCRIBE HISTORY output")
    // 3) tampered newest entry: spot-check fails, whole sidecar ignored
    val lines = new String(saved, "UTF-8").linesIterator.toSeq
    val tampered = (lines.dropRight(1) :+
      lines.last.replaceFirst("SET TBLPROPERTIES", "EVIL OP")).mkString("\n")
    java.nio.file.Files.writeString(sidecar.toPath, tampered)
    val rows = t.history().collect()
    assert(!rows.exists(_.getString(2) == "EVIL OP"),
      "a tampered sidecar entry surfaced in DESCRIBE HISTORY")
    // 4) time travel agrees with the recorded clock whether primed or not
    java.nio.file.Files.write(sidecar.toPath, saved)
    val ts30 = t.commitInstant(30L)
    TxLog.instantCache.clear()
    TxLog.purgeMetaCaches(t.root, 61L)
    assert(t.versionAsOf(ts30) === 30L)
  }

  test("mtime-sourced checkpoint rows re-stat: a moved pre-ICT mtime surfaces in DESCRIBE HISTORY") {
    // the sidecar snapshots mtime-derived instants at write time, but
    // file mtimes are MUTABLE (copies/migrations move them while the
    // newest entry still spot-checks clean) — history() must re-stat
    // recorded=false rows instead of serving the stale snapshot, and
    // still without opening their manifests
    val t = build("mtime_restat", 25) // v0 and v1 (the ICT arm) are mtime-sourced
    assert(new java.io.File(s"${t.root}/_txlog/_history").exists())
    val before = t.history().collect().find(_.getLong(0) === 0L).get
      .getTimestamp(1).getTime
    val moved = before + 7770000L
    assert(new java.io.File(s"${t.root}/_txlog/00000000.json")
      .setLastModified(moved))
    val opens0 = TxLog.headerReads.get()
    val after = t.history().collect()
    val opens = TxLog.headerReads.get() - opens0
    assert(after.find(_.getLong(0) === 0L).get.getTimestamp(1).getTime === moved,
      "DESCRIBE HISTORY served the sidecar's stale mtime snapshot")
    // recorded rows still serve from the sidecar copy, and the re-stat
    // is a getFileStatus, not a manifest open: the open count stays
    // the spot-check + O(recent)
    assert(opens <= 2L * TxLog.SidecarEvery + 5,
      s"re-stat turned into $opens manifest opens")
  }

  test("vacuum interplay: checkpoint entries for deleted versions drop out of every reader") {
    val t = build("vacuumed", 40)
    assert(new java.io.File(s"${t.root}/_txlog/_history").exists())
    t.vacuum(keepVersions = 3)
    // history serves exactly the surviving window — the checkpoint
    // still covers 0..40 but entries below the vacuum boundary are
    // filtered before trust, never resurrected
    val rows = t.history().collect()
    assert(rows.length === 3, s"vacuumed versions leaked: ${rows.length}")
    assert(rows.map(_.getLong(0)).toSeq === Seq(40L, 39L, 38L))
    // and the primed clock never probes a vacuumed version
    TxLog.instantCache.clear()
    TxLog.purgeMetaCaches(t.root, 41L)
    assert(t.versionAsOf(t.commitInstant(39L)) === 39L)
    intercept[IllegalArgumentException](
      t.versionAsOf(t.commitInstant(38L) - 1000000L))
  }

  test("same-root recreation: the dead incarnation's checkpoint is rejected by the spot-check") {
    val loc = tmpDir("hist_ckpt_recreate")
    val t0 = TxLog(spark, loc)
    t0.overwrite(Seq((1L, "old")).toDF("id", "v"))
    t0.setProperties(Seq(TxLog.IctProp -> "true"))
    (2 to 30).foreach(i => t0.setProperties(Seq("tick" -> i.toString)))
    val oldSidecar = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$loc/_txlog/_history"))
    // recreate at the same root with a shorter log, then plant the
    // DEAD incarnation's checkpoint file over it
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(loc))
    val t1 = TxLog(spark, loc)
    t1.overwrite(Seq((1L, "new")).toDF("id", "v"))
    t1.append(Seq((2L, "new2")).toDF("id", "v"), op = "APPEND")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$loc/_txlog/_history"), oldSidecar)
    TxLog.instantCache.clear()
    TxLog.purgeMetaCaches(loc, 0L)
    val rows = t1.history().collect()
    assert(rows.length === 2, s"dead checkpoint leaked rows: ${rows.length}")
    assert(rows.head.getString(2) === "APPEND")
    assert(!rows.exists(_.getString(2).startsWith("SET TBLPROPERTIES")),
      "a dead incarnation's checkpoint entries surfaced after recreation")
  }
}
