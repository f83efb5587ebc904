package graft.sources.connector

import java.io.IOException
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Exactly-once object-store sink for stores WITHOUT atomic rename — the
  * real-S3 shape of [[TwoPcObjectStoreClient]] (reference
  * connectors/s3_bucket_sink targets actual S3, where FileSystem rename is
  * copy+delete and a reader can observe a half-copied object). Here
  * visibility is governed by a MANIFEST, not by object placement — the
  * Iceberg-style commit discipline: readers never list the data area, they
  * read committed manifests and fetch exactly the objects those name.
  *
  * Data objects are immutable and written ONCE, to per-attempt unique
  * paths `base/data/<txn>/a<attempt>/<key>`; nothing is ever renamed or
  * overwritten in place. A torn data write (crash mid-PUT) leaves bytes at
  * a path no manifest will ever reference, because a replay stages a FRESH
  * attempt directory — readers cannot see torn objects even on a store
  * where writes are non-atomic.
  *
  * The manifest itself is atomic without rename by being SELF-VERIFYING:
  *   {{{
  *   GRAFT-MANIFEST v1 <txn> <attempt>
  *   <key>\t<path relative to base>          (one per object, sorted)
  *   END <nEntries> <crc32 of the entry lines>
  *   }}}
  * Readers ignore a manifest whose footer is missing or whose CRC does not
  * match — a torn manifest write is indistinguishable from no manifest,
  * and recovery rewrites it idempotently (same txn, same attempt, same
  * sorted entries → byte-identical content).
  *
  * One micro-batch = one transaction, strictly ordered:
  *   1. STAGE    — executors PUT every row to `data/<txn>/a<attempt>/<key>`
  *   2. DECIDE   — append `2 <txn> commit a<attempt>` to the engine-side
  *                 fsync'd txn log (durable BEFORE anything is visible)
  *   3. PUBLISH  — write the self-verifying manifest; the batch is now
  *                 visible to readers, atomically
  *
  * Crash windows:
  *   - before DECIDE  → no manifest references the attempt; replay stages
  *                      attempt+1; the orphan dir is [[gc]]-collected
  *   - after DECIDE, before a VALID manifest lands → recovery rewrites the
  *                      manifest for the decided attempt (its objects are
  *                      complete: the decision is only logged after the
  *                      stage job finished)
  *   - after PUBLISH  → replayed batch skips whole
  *
  * Determinism contract (same as every 2PC sink here): a replayed batch id
  * must produce the same key set — true for Spark's replayable sources.
  * Single-writer per stream, like the reference's one connection per
  * worker; shard across streams for parallel commit.
  */
final class ManifestObjectStoreClient(baseUri: String, txnLogDir: Path,
    streamName: String = "objects") {

  private val base = baseUri.stripSuffix("/")
  private val logPath = txnLogDir.resolve(s"txnlog-manifest-$streamName")
  Files.createDirectories(txnLogDir)

  // engine txn log, append-only, fsync per append:
  //   1 <txn> <attempt> <nKeys>      attempt staged
  //   2 <txn> <commit|abort> <attempt>
  private[connector] var decisions = Map.empty[String, (Boolean, Int)]
  private[connector] var attempts = Map.empty[String, Int]
  replayLog()

  private def replayLog(): Unit = {
    if (!Files.exists(logPath)) return
    import scala.jdk.CollectionConverters._
    Files.readAllLines(logPath, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).foreach { line =>
        line.split(" ") match {
          case Array("1", txn, a, _) =>
            attempts += txn -> math.max(a.toInt, attempts.getOrElse(txn, -1))
          case Array("2", txn, d, a) =>
            decisions += txn -> ((d == "commit", a.toInt))
          case _ => throw new IOException(s"bad manifest txn log line: $line")
        }
      }
  }

  private def appendLog(line: String): Unit = {
    val ch = java.nio.channels.FileChannel.open(logPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        (line + "\n").getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
  }

  // test hooks: die in each interesting window
  @volatile private[graft] var crashAfterStage = false
  @volatile private[graft] var crashAfterDecisionLog = false

  private def txnDirName(txn: String): String = txn.replace(':', '_')
  private def fs() = org.apache.hadoop.fs.FileSystem
    .get(new URI(base), new org.apache.hadoop.conf.Configuration())
  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Ship one micro-batch of `(key string, body binary)` rows as one
    * transaction. Returns the number of objects published, or None when
    * the batch already committed in a previous incarnation.
    */
  def processBatch(batchId: Long, batch: DataFrame): Option[Long] = {
    val txn = s"$streamName:c_id=$batchId"
    decisions.get(txn) match {
      case Some((true, attempt)) =>
        // committed before: manifest valid → skip whole; torn/missing
        // manifest → rewrite it for the decided (complete) attempt
        if (ManifestObjectStore.readManifest(fs(), base, txn).isEmpty)
          writeManifest(txn, attempt)
        return None
      case _ => ()
    }

    // fresh run or replay of an undecided txn: log the abort of any prior
    // attempt (auditability; its directory becomes gc-able garbage) and
    // stage a brand-new attempt — torn objects from the dead attempt are
    // never referenced, the replay never writes over them
    val attempt = attempts.getOrElse(txn, -1) + 1
    if (attempt > 0) {
      appendLog(s"2 $txn abort ${attempt - 1}")
      decisions += txn -> ((false, attempt - 1))
    }

    val attemptDir = s"$base/data/${txnDirName(txn)}/a$attempt"
    val rows = batch
      .select(col("key").cast("string"), col("body").cast("binary"))
    val stagedCount = batch.sparkSession.sparkContext.longAccumulator
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pfs = org.apache.hadoop.fs.FileSystem.get(
          new URI(attemptDir), new org.apache.hadoop.conf.Configuration())
        it.foreach { r =>
          val key = r.getString(0)
          require(!key.contains('\t') && !key.contains('\n'),
            s"object key must not contain tab/newline: $key")
          val p = new org.apache.hadoop.fs.Path(s"$attemptDir/$key")
          val out = pfs.create(p, true)
          try out.write(r.getAs[Array[Byte]](1))
          finally out.close()
          stagedCount.add(1L)
        }
      }
    }
    appendLog(s"1 $txn $attempt ${stagedCount.value}")
    attempts += txn -> attempt
    if (crashAfterStage)
      throw new IOException("test crash: after stage, before decision")

    // DECIDE — durable before anything becomes visible
    appendLog(s"2 $txn commit $attempt")
    decisions += txn -> ((true, attempt))
    if (crashAfterDecisionLog)
      throw new IOException("test crash: after decision, before manifest")

    // PUBLISH — the manifest write IS the commit point for readers
    writeManifest(txn, attempt)
    Some(stagedCount.value.longValue)
  }

  /** Build the manifest from a listing of the decided attempt directory
    * (safe: the decision is logged only after the stage job completed, so
    * every object in it is whole) and PUT it in one create-close. Sorted
    * entries make the rewrite byte-identical, so recovery overwrite is
    * idempotent even against a concurrent reader mid-fetch.
    */
  private def writeManifest(txn: String, attempt: Int): Unit = {
    val dfs = fs()
    val attemptDir = s"$base/data/${txnDirName(txn)}/a$attempt"
    val entries = ManifestObjectStore
      .listRec(dfs, hPath(attemptDir))
      .map { p =>
        val abs = p.toUri.getPath
        val baseP = hPath(attemptDir).toUri.getPath
        val key = abs.stripPrefix(baseP).stripPrefix("/")
        (key, s"data/${txnDirName(txn)}/a$attempt/$key")
      }.sortBy(_._1)
    val body = ManifestObjectStore.render(txn, attempt, entries)
    val man = hPath(s"$base/.manifests/${txnDirName(txn)}")
    if (man.getParent != null) dfs.mkdirs(man.getParent)
    val out = dfs.create(man, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Engine-side garbage collection: delete attempt directories of THIS
    * stream that are neither referenced by a valid manifest nor the
    * decided-but-not-yet-published attempt of a committed txn (the
    * recovery window). Returns the number of directories removed.
    */
  def gc(): Int = {
    val dfs = fs()
    val dataRoot = hPath(s"$base/data")
    if (!dfs.exists(dataRoot)) return 0
    var removed = 0
    val prefix = txnDirName(s"$streamName:")
    dfs.listStatus(dataRoot).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith(prefix)).foreach { txnDir =>
        val txn = txnDir.getPath.getName.replaceFirst("_c_id=", ":c_id=")
        val live: Set[Int] = decisions.get(txn) match {
          case Some((true, a)) => Set(a)
          case _ => Set.empty
        }
        dfs.listStatus(txnDir.getPath).filter(_.isDirectory).foreach { ad =>
          val a = ad.getPath.getName.stripPrefix("a").toInt
          if (!live.contains(a)) { dfs.delete(ad.getPath, true); removed += 1 }
        }
        if (dfs.listStatus(txnDir.getPath).isEmpty)
          dfs.delete(txnDir.getPath, true)
      }
    removed
  }
}

/** Reader side + shared manifest codec. Readers depend ONLY on manifests:
  * a torn data object or torn manifest is invisible to them by
  * construction, on any store whose single-object PUT-then-close is all
  * that's assumed (no rename, no list-after-write of the data area).
  */
object ManifestObjectStore {

  def foreachBatchWriter(client: ManifestObjectStoreClient)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    client.processBatch(batchId, df)
    ()
  }

  private[connector] def render(txn: String, attempt: Int,
      entries: Seq[(String, String)]): String = {
    val lines = entries.map { case (k, p) => s"$k\t$p" }
    val crc = new CRC32()
    lines.foreach(l => crc.update(l.getBytes(StandardCharsets.UTF_8)))
    (s"GRAFT-MANIFEST v1 $txn a$attempt" +: lines :+
      s"END ${entries.size} ${crc.getValue}").mkString("", "\n", "\n")
  }

  /** Parse + verify one manifest body; None when torn/invalid. */
  private[connector] def parse(body: String): Option[Seq[(String, String)]] = {
    val lines = body.split("\n", -1).toSeq.dropRight(1) // trailing newline
    if (lines.size < 2 || !lines.head.startsWith("GRAFT-MANIFEST v1 "))
      return None
    val footer = lines.last.split(" ")
    if (footer.length != 3 || footer(0) != "END") return None
    val entryLines = lines.slice(1, lines.size - 1)
    val crc = new CRC32()
    entryLines.foreach(l => crc.update(l.getBytes(StandardCharsets.UTF_8)))
    if (entryLines.size.toString != footer(1) ||
      crc.getValue.toString != footer(2)) return None
    Some(entryLines.map { l =>
      val i = l.indexOf('\t')
      if (i < 0) return None
      (l.substring(0, i), l.substring(i + 1))
    })
  }

  private[connector] def listRec(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) listRec(fs, st.getPath) else Seq(st.getPath)
    }
  }

  /** The valid manifest of `txn`, if any: (key → path relative to base). */
  def readManifest(fs: org.apache.hadoop.fs.FileSystem, base: String,
      txn: String): Option[Seq[(String, String)]] = {
    val man = new org.apache.hadoop.fs.Path(
      s"${base.stripSuffix("/")}/.manifests/${txn.replace(':', '_')}")
    if (!fs.exists(man)) return None
    val in = fs.open(man)
    val body =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        new String(buf.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    parse(body)
  }

  /** All committed objects under `base`, later batches overriding earlier
    * ones per key: key → path relative to base. Driver-side listing of
    * `.manifests/` only — at scale, hand the manifest list to a
    * distributed read (one task per manifest); the data area is never
    * listed by readers.
    */
  def committedObjects(baseUri: String): Map[String, String] = {
    val base = baseUri.stripSuffix("/")
    val fs = org.apache.hadoop.fs.FileSystem
      .get(new URI(base), new org.apache.hadoop.conf.Configuration())
    val manDir = new org.apache.hadoop.fs.Path(s"$base/.manifests")
    if (!fs.exists(manDir)) return Map.empty
    val manifests = fs.listStatus(manDir).toSeq.map(_.getPath.getName)
      .flatMap { name =>
        val txn = name.replaceFirst("_c_id=", ":c_id=")
        val cid = txn.split(":c_id=").lift(1).flatMap(_.toLongOption)
        cid.flatMap(c => readManifest(fs, base, txn).map(es => (c, es)))
      }.sortBy(_._1)
    manifests.foldLeft(Map.empty[String, String]) { case (acc, (_, es)) =>
      acc ++ es.toMap
    }
  }

  /** Fetch one committed object's bytes by its manifest-relative path. */
  def readObject(baseUri: String, relPath: String): Array[Byte] = {
    val base = baseUri.stripSuffix("/")
    val fs = org.apache.hadoop.fs.FileSystem
      .get(new URI(base), new org.apache.hadoop.conf.Configuration())
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$base/$relPath"))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      buf.toByteArray
    } finally in.close()
  }
}
