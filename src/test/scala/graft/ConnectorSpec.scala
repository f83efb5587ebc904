package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import java.nio.file.Files
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GraftAggregation, Pipeline}
import graft.sources._

/** Source/sink connector surface: Kafka option contract, TCP/socket source
  * and sink integration (real sockets), the directory-queue connector
  * demo, and the shuffle-free local_key_by/local_collect stages.
  */
class ConnectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()

  test("kafka source/sink configs build the Spark kafka option surface") {
    val src = KafkaSourceConfig("celsius_feed", Seq("b1:9092", "b2:9092"),
      "celsius", startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L))
    assert(src.format == "kafka")
    assert(src.options == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "celsius",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> "50000"))
    val sink = KafkaSinkConfig(Seq("b1:9092"), "out_topic", "/tmp/ckpt")
    assert(sink.options == Map(
      "kafka.bootstrap.servers" -> "b1:9092",
      "topic" -> "out_topic",
      "checkpointLocation" -> "/tmp/ckpt"))
  }

  test("tcp source: Pipeline.source over a live socket stream") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val pusher = new Thread(() => {
      val s = server.accept()
      val w = new PrintWriter(s.getOutputStream)
      Seq("32.0", "212.0", "98.6").foreach(w.println)
      w.flush()
      Thread.sleep(5000)
      s.close()
    })
    pusher.setDaemon(true)
    pusher.start()
    val p = Pipeline.source(spark, TcpSourceConfig("tcp_in", "localhost", port))
    assert(p.ds.isStreaming)
    val q = p.toDF.writeStream.format("memory").queryName("tcp_out").start()
    try {
      val deadline = System.currentTimeMillis + 30000
      while (spark.table("tcp_out").count() < 3 &&
        System.currentTimeMillis < deadline) Thread.sleep(200)
      assert(spark.table("tcp_out").collect().map(_.getString(0)).toSet ==
        Set("32.0", "212.0", "98.6"))
    } finally { q.stop(); server.close() }
  }

  test("tcp sink: rows arrive newline-framed on a live socket") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val server = new ServerSocket(0)
    val received = mutable.ArrayBuffer.empty[String]
    val reader = new Thread(() => {
      while (!server.isClosed) {
        try {
          val s = server.accept()
          val r = new BufferedReader(new InputStreamReader(s.getInputStream))
          var line = r.readLine()
          while (line != null) {
            received.synchronized(received += line)
            line = r.readLine()
          }
          s.close()
        } catch { case _: Exception => () }
      }
    })
    reader.setDaemon(true)
    reader.start()
    val in = MemoryStream[String]
    val q = TcpSinkConfig("localhost", server.getLocalPort)
      .start(in.toDF().coalesce(1))
    try {
      in.addData("alert:7", "alert:9")
      q.processAllAvailable()
      val deadline = System.currentTimeMillis + 30000
      while (received.synchronized(received.size) < 2 &&
        System.currentTimeMillis < deadline) Thread.sleep(200)
      assert(received.synchronized(received.toSet) == Set("alert:7", "alert:9"))
    } finally { q.stop(); server.close() }
  }

  test("directory-queue connector source tails landed files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dirq").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch1.json"),
      "{\"reading\": 1}\n{\"reading\": 2}\n")
    val cfg = DirectoryQueueSourceConfig("dirq", dir, "json",
      StructType(Seq(StructField("reading", LongType))))
    val q = cfg.load(spark).writeStream
      .format("memory").queryName("dirq_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dirq_out").as[Long].collect().toSet == Set(1L, 2L))
      Files.writeString(java.nio.file.Paths.get(s"$dir/batch2.json"),
        "{\"reading\": 3}\n")
      q.processAllAvailable()
      assert(spark.table("dirq_out").as[Long].collect().toSet == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("local_key_by/local_collect aggregate partition-locally with no shuffle") {
    import spark.implicits._
    val sumAgg = new GraftAggregation[Long, Long, Long] {
      val name = "sum"
      def initialAccumulator = 0L
      def update(in: Long, acc: Long) = acc + in
      def combine(a: Long, b: Long) = a + b
      def output(acc: Long) = acc
    }
    val ds = spark.range(0, 1000, 1, 8).as[Long]
    val localKeyed = Pipeline.source("lkb", ds).localKeyBy(_ % 10, sumAgg)
    val keyedPlan = localKeyed.ds.queryExecution.executedPlan.toString
    assert(!keyedPlan.contains("Exchange"), keyedPlan.take(1500))
    // two-phase: accumulator partials merge via combine to the global answer
    val merged = Pipeline.source("lkp", ds).localKeyByPartials(_ % 10, sumAgg)
      .ds.groupByKey(_._1)
      .mapValues(_._2).reduceGroups(sumAgg.combine _)
      .map { case (k, acc) => (k, sumAgg.output(acc)) }
      .collect().toMap
    val expected = (0L until 1000L).groupBy(_ % 10).view.mapValues(_.sum).toMap
    assert(merged == expected)
    val localAll = Pipeline.source("lc", ds).localCollect(sumAgg)
    val allPlan = localAll.ds.queryExecution.executedPlan.toString
    assert(!allPlan.contains("Exchange"), allPlan.take(1500))
    assert(localAll.ds.collect().sum == (0L until 1000L).sum)
    assert(localAll.ds.collect().length == 8) // one partial per partition
  }
}
