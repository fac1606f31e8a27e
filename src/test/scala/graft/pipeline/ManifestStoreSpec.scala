package graft.pipeline

import graft.SparkTestBase
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

/** Object-store commit protocol: the put-if-absent primitive behind
  * every manifest publish. Proves (1) the hazard — naive exists+rename
  * on a store whose rename REPLACES loses a racing writer's commit;
  * (2) the coordinated-put store serializes the same interleaving with
  * ZERO rename atomicity; (3) end-to-end, concurrent TxLog writers
  * through the coordinated store all commit distinct versions with no
  * lost manifest. */
class ManifestStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def hadoopFs(dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def read(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  private def stage(fs: FileSystem, dir: String, content: String): Path = {
    val tmp = new Path(dir, s"_tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    tmp
  }

  test("the hazard: check-then-PUT on an object store loses the racing winner's manifest") {
    // an object store PUT is an UNCONDITIONAL replace (no
    // create-if-absent), so the classic exists-check + publish pair is
    // a TOCTOU race. Deterministic interleaving: A passes its exists()
    // check, B publishes and believes it won, A's PUT replaces B.
    val dir = tmpDir("mstore_hazard")
    val fs = hadoopFs(dir)
    fs.mkdirs(new Path(dir))
    val dst = java.nio.file.Paths.get(dir, "00000000.json")
    def put(content: String): Unit = // the object-store primitive
      java.nio.file.Files.write(dst, content.getBytes("UTF-8"))
    assert(!java.nio.file.Files.exists(dst))   // A's check-then-act window opens
    put("manifest B")                          // B publishes and believes it won
    put("manifest A")                          // A's PUT silently replaces B
    assert(java.nio.file.Files.readString(dst) === "manifest A") // B is lost
  }

  test("coordinated put serializes the same interleaving with zero rename atomicity") {
    val dir = tmpDir("mstore_coord")
    val fs = hadoopFs(dir)
    fs.mkdirs(new Path(dir))
    val log = new Path(dir)
    val dst = new Path(dir, "00000000.json")
    // same schedule: A starts first, B tries before A publishes — the
    // CLAIM, not the filesystem, decides; B loses immediately and
    // never writes the destination
    val aWon = CoordinatedPutManifestStore.putIfAbsent(
      fs, log, dst, "manifest A".getBytes("UTF-8"))
    val bWon = CoordinatedPutManifestStore.putIfAbsent(
      fs, log, dst, "manifest B".getBytes("UTF-8"))
    assert(aWon && !bWon)
    assert(read(fs, dst) === "manifest A")
    // a dest published by an EARLIER process (present on store, never
    // claimed in this JVM) also refuses the claim winner
    val dst2 = new Path(dir, "00000001.json")
    val tmp = stage(fs, dir, "foreign")
    fs.rename(tmp, dst2)
    assert(!CoordinatedPutManifestStore.putIfAbsent(
      fs, log, dst2, "late".getBytes("UTF-8")))
    assert(read(fs, dst2) === "foreign")
  }

  test("5 concurrent TxLog appends through the coordinated store commit 5 distinct versions, none lost") {
    val root = tmpDir("mstore_race")
    withConf("spark.graft.txlog.manifestStore.file.impl" -> "coordinated") {
      TxLog(spark, root).overwrite(Seq((-1L, "seed")).toDF("id", "v"))
      // 5 writers: a racer can lose one optimistic round per other
      // writer's commit, and MaxRaceRetries is 5 — N-1 must stay below it
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      try {
        val futures = (0 until 5).map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long =
              TxLog(spark, root).append(Seq((i.toLong, s"w$i")).toDF("id", "v"))
          })
        }
        val versions = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        // every writer won a DISTINCT version 1..8 — the optimistic
        // loop retried losers forward instead of overwriting winners
        assert(versions.sorted === (1L to 5L))
      } finally pool.shutdown()
      val t = TxLog(spark, root)
      assert(t.currentVersion() === 5L)
      // no manifest was lost: every version reads, each adds one row
      (0L to 5L).foreach(v => assert(t.snapshot(v).count() === v + 1))
      assert(t.snapshot().select("id").as[Long].collect().sorted ===
        (-1L to 4L).toArray)
    }
  }

  test("scheme routing: file/hdfs default to link-rename, object-store schemes to coordinated, conf overrides") {
    val none = (_: String) => Option.empty[String]
    assert(ManifestStore.forScheme(none, "file") === LinkRenameManifestStore)
    assert(ManifestStore.forScheme(none, "hdfs") === LinkRenameManifestStore)
    Seq("s3a", "abfss", "gs", "wasbs").foreach(s =>
      assert(ManifestStore.forScheme(none, s) === CoordinatedPutManifestStore))
    val forced = (k: String) =>
      if (k == "spark.graft.txlog.manifestStore.file.impl") Some("coordinated")
      else None
    assert(ManifestStore.forScheme(forced, "file") === CoordinatedPutManifestStore)
  }
}
