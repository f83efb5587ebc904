package graft.sources.connector

import java.io.IOException
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Exactly-once OBJECT-STORE sink: [[TwoPcSinkClient]]'s two-log
  * decision-before-publish pattern composed onto
  * [[graft.sources.ObjectStoreSinkConfig]]'s per-row PUT surface
  * (reference connectors/s3_bucket_sink, which is at-least-once; the 2PC
  * discipline comes from connector_sink_twopc.pony — here the "sink
  * process" is the object store itself and its vote is implicit in a
  * completed stage).
  *
  * One micro-batch = one transaction, in four strictly ordered steps:
  *
  *   1. STAGE    — executors PUT every row to `base/.staging/<txn>/<key>`
  *                 (parallel, partition-owned; staging is invisible to
  *                 readers of `base`)
  *   2. DECIDE   — append `2 <txn> commit` to the engine-side fsync'd txn
  *                 log. The decision is durable BEFORE anything publishes.
  *   3. PUBLISH  — executors rename each staged object to `base/<key>`
  *                 (idempotent: a missing staged file with the final
  *                 present means an earlier incarnation already moved it)
  *   4. MANIFEST — atomic-rename a manifest marker for the txn, then
  *                 delete the staging dir. The manifest is the "phase-2
  *                 delivered" record.
  *
  * Crash windows replay exactly like the socket client's:
  *   - before DECIDE   → recovery logs abort, wipes `.staging/<txn>`,
  *                       batch re-stages from scratch (no final object was
  *                       ever visible)
  *   - after DECIDE,
  *     before MANIFEST → recovery RE-PUBLISHES: renames whatever is still
  *                       staged, accepts already-final keys, then writes
  *                       the manifest — each object lands exactly once
  *   - after MANIFEST  → replayed batch is skipped whole
  *
  * Scale/portability note: rename is atomic on `file:` and HDFS; on S3 the
  * FileSystem rename is copy+delete, so production S3 use wants a
  * rename-capable layer underneath — the protocol (decision log before any
  * visible mutation, manifest after all of them) is storage-agnostic and
  * mirrors Spark's own v1 job-commit discipline.
  *
  * Determinism contract (same as every 2PC sink here): a replayed batch id
  * must produce the same key set — true for Spark's replayable sources.
  */
final class TwoPcObjectStoreClient(baseUri: String, txnLogDir: Path,
    streamName: String = "objects") {

  private val base = baseUri.stripSuffix("/")
  private val logPath = txnLogDir.resolve(s"txnlog-objstore-$streamName")
  Files.createDirectories(txnLogDir)

  // same append-only line format as TwoPcSinkClient's engine log:
  //   1 <txnId> <nKeys> 0      staged (start/end degenerate to a count)
  //   2 <txnId> <commit|abort>
  private[connector] var decisions = Map.empty[String, Boolean]
  replayLog()

  private def replayLog(): Unit = {
    if (!Files.exists(logPath)) return
    import scala.jdk.CollectionConverters._
    Files.readAllLines(logPath, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).foreach { line =>
        line.split(" ") match {
          case Array("1", _, _, _) => ()
          case Array("2", txn, d) => decisions += txn -> (d == "commit")
          case _ => throw new IOException(s"bad objstore txn log line: $line")
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

  // test hook: die between the commit decision and the publish/manifest
  @volatile private[graft] var crashAfterDecisionLog = false

  /** HDFS-safe txn directory name (':' is illegal in HDFS path segments). */
  private def txnDirName(txn: String): String = txn.replace(':', '_')

  private def fs(conf: org.apache.hadoop.conf.Configuration) =
    org.apache.hadoop.fs.FileSystem.get(new URI(base), conf)

  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Ship one micro-batch of `(key string, body binary)` rows as one
    * transaction. Returns the number of objects published, or None when
    * the batch already fully published in a previous incarnation.
    */
  def processBatch(batchId: Long, batch: DataFrame): Option[Long] = {
    val txn = s"$streamName:c_id=$batchId"
    val stagingDir = s"$base/.staging/${txnDirName(txn)}"
    val manifest = s"$base/.manifests/${txnDirName(txn)}"
    val conf = new org.apache.hadoop.conf.Configuration()
    val dfs = fs(conf)
    val rows = batch.select(col("key").cast("string"), col("body").cast("binary"))
    val keys = rows.select(col("key"))

    if (decisions.getOrElse(txn, false)) {
      // committed before: either fully published (manifest present →
      // skip whole) or torn between decision and manifest → re-publish
      if (dfs.exists(hPath(manifest))) return None
      publish(keys, txn, stagingDir, manifest)
      return None
    }

    // fresh run, or replay of an undecided txn: abort any leftover stage
    if (decisions.contains(txn) || dfs.exists(hPath(stagingDir))) {
      appendLog(s"2 $txn abort")
      decisions += txn -> false
      dfs.delete(hPath(stagingDir), true)
    }

    // 1. STAGE (executors, parallel)
    val stagedCount = batch.sparkSession.sparkContext.longAccumulator
    val stageBase = stagingDir
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pfs = org.apache.hadoop.fs.FileSystem.get(
          new URI(stageBase), new org.apache.hadoop.conf.Configuration())
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(s"$stageBase/${r.getString(0)}")
          val out = pfs.create(p, true)
          try out.write(r.getAs[Array[Byte]](1))
          finally out.close()
          stagedCount.add(1L)
        }
      }
    }

    // 2. DECIDE — durable before any object becomes visible
    appendLog(s"1 $txn ${stagedCount.value} 0")
    appendLog(s"2 $txn commit")
    decisions += txn -> true
    if (crashAfterDecisionLog)
      throw new IOException("test crash: after objstore decision log")

    // 3-4. PUBLISH + MANIFEST
    publish(keys, txn, stagingDir, manifest)
    Some(stagedCount.value.longValue)
  }

  /** Rename staged objects to their final keys (idempotent per key), then
    * atomically publish the manifest marker and drop the staging dir.
    */
  private def publish(keys: DataFrame, txn: String, stagingDir: String,
      manifest: String): Unit = {
    val b = base
    val sDir = stagingDir
    keys.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pfs = org.apache.hadoop.fs.FileSystem.get(
          new URI(b), new org.apache.hadoop.conf.Configuration())
        it.foreach { r =>
          val key = r.getString(0)
          val staged = new org.apache.hadoop.fs.Path(s"$sDir/$key")
          val fin = new org.apache.hadoop.fs.Path(s"$b/$key")
          if (pfs.exists(staged)) {
            if (fin.getParent != null) pfs.mkdirs(fin.getParent)
            // replace any stale final (an aborted older txn can't have
            // published, but an at-least-once predecessor might have)
            if (pfs.exists(fin)) pfs.delete(fin, false)
            if (!pfs.rename(staged, fin) && !pfs.exists(fin))
              throw new IOException(s"objstore publish: rename failed for $key")
          } else if (!pfs.exists(fin))
            throw new IOException(
              s"objstore publish: $key neither staged nor final (txn $txn)")
        }
      }
    }
    val dfs = fs(new org.apache.hadoop.conf.Configuration())
    val manTmp = hPath(manifest + ".tmp")
    val man = hPath(manifest)
    if (man.getParent != null) dfs.mkdirs(man.getParent)
    val out = dfs.create(manTmp, true)
    try out.write(txn.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!dfs.rename(manTmp, man) && !dfs.exists(man))
      throw new IOException(s"objstore publish: manifest rename failed ($txn)")
    dfs.delete(hPath(stagingDir), true)
  }
}

object TwoPcObjectStore {
  /** foreachBatch adapter: `(key, body)` rows of every micro-batch land in
    * `baseUri` exactly once via [[TwoPcObjectStoreClient]].
    */
  def foreachBatchWriter(client: TwoPcObjectStoreClient)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    client.processBatch(batchId, df)
    ()
  }
}
