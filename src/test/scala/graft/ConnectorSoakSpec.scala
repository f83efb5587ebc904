package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.connector._

/** giles-style soak: a RATE-CONTROLLED sender (reference giles/sender —
  * timed batches against the engine's ingest socket) drives the
  * `graft-connector` source for a sustained window while a verifying
  * receiver (reference giles/receiver / utils/data_receiver) accounts for
  * every message; one mid-soak kill/restart exercises the at-least-once
  * path under load. The accounting report — sent / received / distinct /
  * duplicates / msg/s — prints at the end like a giles run.
  *
  * Duration scales with SPARK_GRAFT_SOAK_SECONDS (default ~30 s so the
  * suite stays fast; set 300+ for a real soak).
  */
class ConnectorSoakSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  /** Paced source: giles sender's batch-per-interval shape (default here
    * ~`rate` messages/sec via parkNanos pacing), on top of the resettable
    * at-least-once contract.
    */
  final class RatedSource(records: IndexedSeq[Array[Byte]], rate: Double)
      extends SeqSource(records) {
    private val intervalNanos = (1e9 / rate).toLong
    private var nextAt = 0L
    override def next(): Option[(Array[Byte], Long)] = {
      val now = System.nanoTime()
      if (nextAt == 0L) nextAt = now
      if (now < nextAt)
        java.util.concurrent.locks.LockSupport.parkNanos(nextAt - now)
      nextAt += intervalNanos
      super.next()
    }
  }

  object Account {
    val counts = new ConcurrentHashMap[Long, AtomicInteger]()
    def record(id: Long): Unit =
      counts.computeIfAbsent(id, _ => new AtomicInteger).incrementAndGet()
    def distinct: Int = counts.size
    def received: Long = {
      var t = 0L
      counts.forEach((_, c) => t += c.get)
      t
    }
    def dups: Seq[Long] = {
      val b = Seq.newBuilder[Long]
      counts.forEach((id, c) => if (c.get > 1) b += id)
      b.result()
    }
  }

  private def startQuery(ckpt: String) =
    spark.readStream.format("graft-connector")
      .option("port", "0").option("name", "soak").option("cookie", "s")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => Account.record(r.getLong(1)))
      }
      .start()

  test("soak: sustained rated send with mid-soak restart accounts for every message") {
    val soakSeconds =
      sys.env.getOrElse("SPARK_GRAFT_SOAK_SECONDS", "30").toInt
    val rate = 2000.0 // msgs/sec, giles-sender style pacing
    val n = (soakSeconds * rate).toInt
    val records = (1 to n).map(i => s"m-$i".getBytes(StandardCharsets.UTF_8))
    val source = new RatedSource(records, rate)
    val ckpt = Files.createTempDirectory("soak_ckpt").toString
    Account.counts.clear()

    val client = new AtLeastOnceClient(
      "localhost", () => ConnectorRegistry.port("soak").getOrElse(
        throw new java.io.IOException("listener not up")),
      "s", "soak_app", "w1", 1L, "soak_stream", source)

    val t0 = System.nanoTime()
    var q = startQuery(ckpt)
    val clientThread = client.runInBackground()
    try {
      // run a third of the soak, then kill + restart under load
      Thread.sleep(soakSeconds * 1000L / 3)
      val atKill = Account.distinct
      q.stop()
      Thread.sleep(500)
      q = startQuery(ckpt)
      assert(atKill > 0, "no messages before the kill — soak never started")

      // the sender finishes when the whole stream is sent AND acked
      clientThread.join(soakSeconds * 4000L + 120000L)
      assert(!clientThread.isAlive, "sender never got its final ack")
      q.processAllAvailable()
      val elapsedSec = (System.nanoTime() - t0) / 1e9

      // giles-receiver accounting: complete, at-least-once, bounded dups
      assert(Account.distinct == n,
        s"lost ${n - Account.distinct} of $n messages")
      val dups = Account.dups
      assert(dups.size <= n / 3 + 1000,
        s"duplicate volume ${dups.size} exceeds the replay window")
      assert(source.ackedPor.get == n.toLong, "final por not acked")
      val report =
        s"""{"soak":"connector","sent":${client.sent.get},"expected":$n,""" +
          s""""received":${Account.received},"distinct":${Account.distinct},""" +
          s""""duplicates":${dups.size},"elapsed_sec":${f"$elapsedSec%.1f"},""" +
          s""""rate_target":$rate,"restarts":1}"""
      info(report)
      println(s"[soak] $report")
    } finally {
      client.stopped.set(true)
      spark.streams.active.foreach(_.stop())
    }
  }
}
