package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE atomic primitive a [[TxLog]] commit needs: publish
  * `content` as `dest` iff nothing exists there yet (put-if-absent),
  * returning whether THIS writer won the name. Everything else in the
  * commit protocol — staging, optimistic retries, the manifest format
  * — is store-agnostic, so porting the table format to a new storage
  * system means implementing exactly this trait (Delta's LogStore
  * contract, reduced to its one load-bearing method).
  *
  * Implementations stage under `logDir/_tmp_*` — [[TxLog.vacuum]]'s
  * crashed-writer debris sweep relies on that prefix.
  */
trait ManifestStore {
  def putIfAbsent(fs: FileSystem, logDir: Path, dest: Path,
                  content: Array[Byte]): Boolean
}

object ManifestStore {

  /** Store for `scheme`, overridable per scheme via
    * `spark.graft.txlog.manifestStore.<scheme>.impl` = `link-rename` |
    * `coordinated` | a `ManifestStore` class name (Delta's
    * `spark.delta.logStore.<scheme>.impl` convention). Defaults:
    * filesystems with an atomic create-if-absent primitive (local
    * link(2), HDFS rename) use [[LinkRenameManifestStore]]; every
    * other scheme — the object stores (s3a, abfss, gs, wasbs), whose
    * rename is copy+delete and whose put unconditionally replaces —
    * uses [[CoordinatedPutManifestStore]]. */
  def forScheme(conf: String => Option[String], scheme: String): ManifestStore =
    conf(s"spark.graft.txlog.manifestStore.$scheme.impl") match {
      case Some("link-rename") => LinkRenameManifestStore
      case Some("coordinated") => CoordinatedPutManifestStore
      case Some(className) => Class.forName(className)
        .getDeclaredConstructor().newInstance().asInstanceOf[ManifestStore]
      case None => scheme match {
        case "file" | "hdfs" | "viewfs" => LinkRenameManifestStore
        case _ => CoordinatedPutManifestStore
      }
    }
}

/** Create-if-absent provided by the FILESYSTEM itself:
  *
  *   - local FS: hard-link publish via `Files.createLink` — link(2)
  *     fails with EEXIST when the destination exists, with no
  *     check-then-act window. (Hadoop's `RawLocalFileSystem.rename`
  *     maps to rename(2), which silently REPLACES an existing
  *     destination, so the classic exists+rename pair is a TOCTOU race
  *     on local FS — a losing writer could overwrite the winner's
  *     manifest; ManifestStoreSpec demonstrates the lost update.)
  *   - HDFS/viewfs: plain rename — atomic, fails on an existing
  *     destination.
  */
object LinkRenameManifestStore extends ManifestStore {
  override def putIfAbsent(fs: FileSystem, logDir: Path, dest: Path,
                           content: Array[Byte]): Boolean = {
    val tmp = new Path(logDir, s"_tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content) finally out.close()
    val won =
      if (fs.getUri.getScheme == "file")
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else !fs.exists(dest) && fs.rename(tmp, dest)
    fs.delete(tmp, true)
    won
  }
}

/** Commit protocol for stores with NO create-if-absent primitive —
  * the object-store home the reference actually runs on (`abfss://…`):
  * an external COORDINATOR hands out exclusive claims on manifest
  * names; only the claim winner writes the object, so the store's
  * non-atomic rename/replace is safe — nobody else will ever write
  * that name. This is exactly delta-on-S3's design (DynamoDB
  * LogStore); here the coordinator is an in-process claims set, i.e.
  * the SINGLE-DRIVER scope of Delta's default `S3SingleDriverLogStore`
  * — correct for any number of concurrent writer THREADS on one
  * driver. A multi-driver deployment swaps `claim` for a conditional
  * put against DynamoDB/etcd/CosmosDB (same one-method surface);
  * production coordinators also attach a TTL so a writer that crashes
  * between claiming and publishing releases the name — an in-process
  * claim dies with the JVM, so no TTL is needed here.
  */
object CoordinatedPutManifestStore extends ManifestStore {
  private val claims = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  override def putIfAbsent(fs: FileSystem, logDir: Path, dest: Path,
                           content: Array[Byte]): Boolean = {
    val key = dest.toUri.toString
    // claim FIRST: between two in-process racers, exactly one proceeds
    if (!claims.add(key)) return awaitLoss(fs, dest)
    // an object already present was published by an EARLIER process
    // (claims are process-scoped): lost before we started
    if (fs.exists(dest)) return false
    val tmp = new Path(logDir, s"_tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content) finally out.close()
    // under the claim the rename needs NO atomicity — we are the only
    // writer that will ever address this destination
    val won = fs.rename(tmp, dest)
    fs.delete(tmp, true)
    won
  }

  /** A lost claim must not return before the WINNER's object is
    * visible: unlike link/rename stores — where losing implies the
    * destination already exists — a claim loses the instant the winner
    * claims, possibly before it publishes. Returning immediately would
    * hand the caller a stale version listing, and its optimistic retry
    * would re-attempt the SAME version until the attempt budget burned
    * with zero progress (the DynamoDB LogStore reads the winning entry
    * back for the same reason). Bounded: a winner that crashed between
    * claiming and publishing (no TTL in the in-process coordinator)
    * surfaces as the caller's retries failing loudly, never as a hang. */
  private def awaitLoss(fs: FileSystem, dest: Path): Boolean = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!fs.exists(dest) && System.nanoTime() < deadline) Thread.sleep(5)
    false
  }
}
