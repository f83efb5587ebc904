package graft

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.connector.{TwoPcObjectStoreClient, TwoPcObjectStore}

/** Object-store exactly-once: the decision-before-publish 2PC pattern on a
  * `file:` tree — the same code path `s3a://` takes through the Hadoop
  * FileSystem API. The critical window is a kill BETWEEN the durable
  * commit decision and the manifest publish: recovery must finish the
  * publish (each object exactly once) and a replayed batch must be a
  * no-op that does not touch the published objects again.
  */
class TwoPcObjectStoreSpec extends AnyFunSuite {
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

  private def readTree(root: Path): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(_.toString.contains("/.staging"))
      .filterNot(_.toString.contains("/.manifests"))
      // Hadoop's ChecksumFileSystem leaves .crc sidecars on file: —
      // a local-FS artifact, not an object
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => root.relativize(p).toString ->
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .toMap
    finally s.close()
  }

  test("kill between decision log and manifest publish: recovery publishes exactly once") {
    val store = Files.createTempDirectory("objstore")
    val logDir = Files.createTempDirectory("objstore_log")
    val expected = (0 until 20)
      .map(i => s"b/obj_$i" -> s"b-body-$i").toMap

    val c1 = new TwoPcObjectStoreClient(s"file:$store", logDir)
    assert(c1.processBatch(0L, batchDf("a", 5)) == Some(5L))
    assert(readTree(store) == (0 until 5).map(i => s"a/obj_$i" -> s"a-body-$i").toMap)

    // the torn window: decision durable, NOTHING published yet
    c1.crashAfterDecisionLog = true
    intercept[IOException] { c1.processBatch(1L, batchDf("b", 20)) }
    assert(!readTree(store).keySet.exists(_.startsWith("b/")),
      "no object may be visible before the publish step")
    assert(Files.exists(store.resolve(".staging")), "batch must be staged")

    // fresh incarnation on the same txn log: the replayed batch is already
    // COMMITTED per the log, so recovery finishes the publish — exactly
    // once — and reports the batch as a skip
    val c2 = new TwoPcObjectStoreClient(s"file:$store", logDir)
    assert(c2.processBatch(1L, batchDf("b", 20)).isEmpty)
    val after = readTree(store)
    assert(after.view.filterKeys(_.startsWith("b/")).toMap == expected)
    assert(Files.exists(store.resolve(".manifests")))
    import scala.jdk.CollectionConverters._
    val staging = store.resolve(".staging")
    val stagingEmpty = !Files.exists(staging) || {
      val ls = Files.list(staging)
      try ls.iterator().asScala.isEmpty finally ls.close()
    }
    assert(stagingEmpty, "staging must be drained after publish")

    // replaying AGAIN must not touch the published objects (no re-PUT):
    // capture per-object mtimes, replay, compare
    def mtimes(): Map[String, Long] = {
      val s = Files.walk(store)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .filter(_.toString.contains("/b/"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    val before = mtimes()
    assert(c2.processBatch(1L, batchDf("b", 20)).isEmpty)
    assert(mtimes() == before, "a fully published txn must be skipped whole")

    // and the next batch proceeds normally on the same client
    assert(c2.processBatch(2L, batchDf("c", 3)) == Some(3L))
    assert(readTree(store).view.filterKeys(_.startsWith("c/")).toMap ==
      (0 until 3).map(i => s"c/obj_$i" -> s"c-body-$i").toMap)
  }

  test("undecided crash mid-stage: replay aborts the leftover stage and re-stages clean") {
    val store = Files.createTempDirectory("objstore2")
    val logDir = Files.createTempDirectory("objstore2_log")
    // simulate a crash DURING staging: a leftover partial staging dir with
    // a stale body, and no decision in the log
    val stale = store.resolve(".staging/objects_c_id=0/x")
    Files.createDirectories(stale)
    Files.write(stale.resolve("obj_0"), "STALE".getBytes(StandardCharsets.UTF_8))

    val c = new TwoPcObjectStoreClient(s"file:$store", logDir)
    assert(c.processBatch(0L, batchDf("x", 4)) == Some(4L))
    val tree = readTree(store)
    assert(tree == (0 until 4).map(i => s"x/obj_$i" -> s"x-body-$i").toMap,
      s"stale staged bytes must never publish: $tree")
  }

  test("streaming foreachBatch adapter: restart from checkpoint, objects exactly once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val store = Files.createTempDirectory("objstore3")
    val logDir = Files.createTempDirectory("objstore3_log")
    val ckpt = Files.createTempDirectory("objstore3_ckpt").toString
    val input = MemoryStream[String]
    val c1 = new TwoPcObjectStoreClient(s"file:$store", logDir)
    def start(client: TwoPcObjectStoreClient) = input.toDS()
      .select(concat(lit("s/"), $"value").as("key"),
        concat(lit("v-"), $"value").cast("binary").as("body"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(TwoPcObjectStore.foreachBatchWriter(client))
      .start()
    val q1 = start(c1)
    input.addData("k1", "k2")
    q1.processAllAvailable()
    assert(readTree(store) == Map("s/k1" -> "v-k1", "s/k2" -> "v-k2"))

    // die in the torn window, restart from the same checkpoint
    c1.crashAfterDecisionLog = true
    input.addData("k3")
    intercept[Exception] { q1.processAllAvailable() }
    assert(!q1.isActive)

    val c2 = new TwoPcObjectStoreClient(s"file:$store", logDir)
    val q2 = start(c2)
    input.addData("k4")
    q2.processAllAvailable()
    q2.stop()
    assert(readTree(store) == Map("s/k1" -> "v-k1", "s/k2" -> "v-k2",
      "s/k3" -> "v-k3", "s/k4" -> "v-k4"))
  }
}
