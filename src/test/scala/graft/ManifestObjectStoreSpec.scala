package graft

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.connector.{ManifestObjectStoreClient, ManifestObjectStore}

/** Manifest-as-commit exactly-once on a `file:` tree: readers consult ONLY
  * committed manifests, so the guarantee must hold even when a data
  * object's placement is NOT atomic (real S3: rename is copy+delete, a
  * plain FileSystem writer can expose a half-copied object). The central
  * scenario: corrupt/tear a data object mid-publish and show readers never
  * see the torn bytes — the manifest either doesn't exist (attempt never
  * decided) or references a different, complete attempt directory.
  */
class ManifestObjectStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  private def batchDf(tag: String, n: Int) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.range(0, n)
      .select(concat(lit(tag + "/obj_"), $"id".cast("string")).as("key"),
        concat(lit(tag + "-body-"), $"id".cast("string")).cast("binary").as("body"))
  }

  /** What a manifest-following reader observes: key → body string. */
  private def readerView(base: String): Map[String, String] =
    ManifestObjectStore.committedObjects(base).map { case (k, rel) =>
      k -> new String(ManifestObjectStore.readObject(base, rel),
        StandardCharsets.UTF_8)
    }

  private def expected(tag: String, n: Int): Map[String, String] =
    (0 until n).map(i => s"$tag/obj_$i" -> s"$tag-body-$i").toMap

  test("torn data object from a dead attempt is never visible to readers") {
    val store = Files.createTempDirectory("manstore")
    val logDir = Files.createTempDirectory("manstore_log")
    val base = s"file:$store"
    val c1 = new ManifestObjectStoreClient(base, logDir)

    assert(c1.processBatch(0L, batchDf("a", 5)) == Some(5L))
    assert(readerView(base) == expected("a", 5))

    // crash AFTER staging, BEFORE the commit decision: attempt a0 of
    // batch 1 is fully on disk but undecided — and we additionally TEAR
    // one of its objects (simulating a non-atomic PUT/copy dying midway)
    c1.crashAfterStage = true
    intercept[IOException] { c1.processBatch(1L, batchDf("b", 8)) }
    c1.crashAfterStage = false
    val tornPath = store.resolve("data/objects_c_id=1/a0/b/obj_3")
    assert(Files.exists(tornPath), "attempt a0 must have staged the object")
    Files.write(tornPath, "b-bo".getBytes(StandardCharsets.UTF_8))
    // a reader between the crash and the replay sees batch 0 only — no
    // manifest references attempt a0, torn or whole
    assert(readerView(base) == expected("a", 5))

    // replay stages a FRESH attempt (a1); the torn a0 object is never
    // referenced, never read, never written over
    assert(c1.processBatch(1L, batchDf("b", 8)) == Some(8L))
    assert(readerView(base) == expected("a", 5) ++ expected("b", 8))
    val manifest = ManifestObjectStore.readManifest(
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
        new org.apache.hadoop.conf.Configuration()),
      base, "objects:c_id=1").getOrElse(fail("manifest must be valid"))
    assert(manifest.forall(_._2.startsWith("data/objects_c_id=1/a1/")))
    assert(Files.readAllBytes(tornPath).length == 4,
      "torn a0 object untouched (immutable data area)")

    // gc removes the dead attempt, keeps both committed ones
    assert(c1.gc() == 1)
    assert(!Files.exists(store.resolve("data/objects_c_id=1/a0")))
    assert(readerView(base) == expected("a", 5) ++ expected("b", 8))
  }

  test("kill between decision and manifest: recovery republishes; torn manifest ignored then rewritten") {
    val store = Files.createTempDirectory("manstore2")
    val logDir = Files.createTempDirectory("manstore2_log")
    val base = s"file:$store"
    val c1 = new ManifestObjectStoreClient(base, logDir)
    assert(c1.processBatch(0L, batchDf("a", 4)) == Some(4L))

    // decision durable, manifest never written
    c1.crashAfterDecisionLog = true
    intercept[IOException] { c1.processBatch(1L, batchDf("b", 6)) }
    assert(readerView(base) == expected("a", 4), "undelivered commit invisible")

    // worse: a TORN manifest (no valid footer) appears — readers must
    // treat it exactly like no manifest
    val manPath = store.resolve(".manifests/objects_c_id=1")
    Files.createDirectories(manPath.getParent)
    Files.write(manPath,
      "GRAFT-MANIFEST v1 objects:c_id=1 a0\nb/obj_0\tdata/objects_c_id=1/a0/b/obj_0\n"
        .getBytes(StandardCharsets.UTF_8))
    assert(readerView(base) == expected("a", 4), "torn manifest ignored")

    // engine restart: fresh client replays the durable log, sees the
    // committed decision with no valid manifest, and rewrites it for the
    // decided attempt — exactly once, no re-stage
    val c2 = new ManifestObjectStoreClient(base, logDir)
    assert(c2.processBatch(1L, batchDf("b", 6)).isEmpty)
    assert(readerView(base) == expected("a", 4) ++ expected("b", 6))
    // replay of the fully published batch is a whole-batch no-op
    assert(c2.processBatch(1L, batchDf("b", 6)).isEmpty)
    assert(readerView(base) == expected("a", 4) ++ expected("b", 6))
  }

  test("streaming foreachBatch adapter: restart from checkpoint, manifest-committed exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, lit}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val store = Files.createTempDirectory("manstore3")
    val logDir = Files.createTempDirectory("manstore3_log")
    val ckpt = Files.createTempDirectory("manstore3_ckpt").toString
    val base = s"file:$store"
    val input = MemoryStream[String]
    def q(c: ManifestObjectStoreClient) = input.toDS()
      .select($"value".as("key"),
        concat($"value", lit("!")).cast("binary").as("body"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(ManifestObjectStore.foreachBatchWriter(c))
      .start()

    val c1 = new ManifestObjectStoreClient(base, logDir)
    val q1 = q(c1)
    input.addData("x", "y")
    q1.processAllAvailable()
    assert(readerView(base) == Map("x" -> "x!", "y" -> "y!"))

    c1.crashAfterDecisionLog = true
    input.addData("z")
    intercept[Exception] { q1.processAllAvailable() }
    assert(!q1.isActive)
    assert(readerView(base) == Map("x" -> "x!", "y" -> "y!"))

    val c2 = new ManifestObjectStoreClient(base, logDir)
    val q2 = q(c2)
    input.addData("w")
    q2.processAllAvailable()
    assert(readerView(base) ==
      Map("x" -> "x!", "y" -> "y!", "z" -> "z!", "w" -> "w!"))
    q2.stop()
  }
}
