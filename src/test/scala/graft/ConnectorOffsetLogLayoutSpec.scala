package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Pins the checkpoint offset-log layout that
  * [[graft.sources.connector]]'s `flushDurableAcks` parses directly:
  * line 0 = version tag, line 1 = JSON batch metadata, line 2+idx = the
  * serialized offset of source idx in declaration order. If a Spark
  * upgrade changes this file format, THIS spec fails loudly (instead of
  * the early-ack path silently degrading to commit()-callback acks —
  * see the warn-once in ConnectorSource.flushDurableAcks).
  */
class ConnectorOffsetLogLayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("offset-seq file: version line, metadata line, one offset per source") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-offlog").toString
    val a = MemoryStream[Int]
    val b = MemoryStream[Int]
    // TWO sources so the per-source line indexing (line 2 + idx) is pinned,
    // not just the single-source case
    val q = a.toDS().toDF("v").union(b.toDS().toDF("v")).writeStream
      .format("memory").queryName("offlog_out")
      .option("checkpointLocation", ckpt)
      .start()
    a.addData(1, 2, 3)
    b.addData(10)
    q.processAllAvailable()
    a.addData(4)
    q.processAllAvailable()
    q.stop()

    val offsetsDir = Paths.get(ckpt, "offsets")
    assert(Files.exists(offsetsDir), "checkpoint has an offsets/ dir")
    val batches = Files.list(offsetsDir).iterator().asScala
      .flatMap(p => p.getFileName.toString.toLongOption.map(_ -> p)).toSeq
    assert(batches.nonEmpty, "offsets/ holds numerically-named batch files")
    val (maxBatch, offFile) = batches.maxBy(_._1)

    val lines = Files.readAllLines(offFile).asScala.filter(_.nonEmpty).toSeq
    // exactly the layout flushDurableAcks assumes:
    assert(lines.length == 2 + 2,
      s"version + metadata + one line per source, got: $lines")
    assert(lines(0).startsWith("v") &&
      lines(0).drop(1).forall(_.isDigit), s"line 0 is a version tag: ${lines(0)}")
    assert(lines(1).startsWith("{") && lines(1).contains("batchWatermarkMs"),
      s"line 1 is JSON batch metadata: ${lines(1)}")
    // MemoryStream offsets serialize as a bare long ordinal; what matters
    // for the parser is POSITION: source 0's offset on line 2, source 1's
    // on line 3, and the two sources' ordinals reflect their own feeds
    // (source a saw 2 batches of data, source b one).
    val offA = lines(2).trim.toLong
    val offB = lines(3).trim.toLong
    assert(offA >= offB, s"per-source lines in declaration order: $offA vs $offB")

    // commits/ mirrors the batch ids — the durability signal the early-ack
    // poll keys on
    val commitsDir = Paths.get(ckpt, "commits")
    assert(Files.exists(commitsDir))
    val committed = Files.list(commitsDir).iterator().asScala
      .flatMap(p => p.getFileName.toString.toLongOption).toSeq
    assert(committed.contains(maxBatch),
      s"commit log reaches the last offsets batch $maxBatch: $committed")
  }
}
