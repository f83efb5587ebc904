package graft.sources

import java.net.{DatagramPacket, DatagramSocket, InetAddress, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Concrete connector adapters from the reference's connectors/ directory
  * (udp_source, udp_sink, s3_bucket_sink — external scripts bridging a
  * transport to the engine), re-expressed for Spark:
  *
  *  - UDP **source**: datagrams can't be replayed, so (exactly like the
  *    reference, where udp_source is a separate relay process feeding the
  *    connector protocol) a tiny [[UdpIngest]] relay lands datagrams into
  *    an at-least-once directory queue that Structured Streaming tails —
  *    the relay is the only stateless-loss boundary, everything after the
  *    rename is replayable.
  *  - UDP **sink**: one datagram per row from each partition
  *    (connectors/udp_sink) — executors send directly, no driver hop.
  *  - **Object-store sink** (connectors/s3_bucket_sink `put_object(Key,
  *    Body)`): each row is PUT as one object `baseUri/key` through the
  *    Hadoop FileSystem API, so `file:` trees test the exact code path
  *    that `s3a://bucket` takes in production. Partitions write in
  *    parallel; a replayed epoch re-PUTs the same keys (idempotent), the
  *    same at-least-once contract as the reference connector.
  */
object UdpIngest {

  final class Relay private[UdpIngest] (socket: DatagramSocket, dir: Path,
      flushEvery: Int) extends AutoCloseable {
    val port: Int = socket.getLocalPort
    @volatile private var running = true
    private val buf = new scala.collection.mutable.ArrayBuffer[String]
    private var seq = 0L

    private[UdpIngest] val thread = new Thread(() => {
      val packet = new DatagramPacket(new Array[Byte](65536), 65536)
      while (running) {
        try {
          socket.receive(packet)
          buf += new String(packet.getData, packet.getOffset,
            packet.getLength, StandardCharsets.UTF_8)
          if (buf.size >= flushEvery) flush()
        } catch {
          case _: java.net.SocketTimeoutException => if (buf.nonEmpty) flush()
          case _: java.net.SocketException if !running => ()
        }
      }
    }, s"udp-ingest-$port")

    /** Land buffered datagrams as one text file, atomically (tmp + rename)
      * so the streaming file source never sees a partial file.
      */
    private def flush(): Unit = {
      val tmp = dir.resolve(s".udp_$seq.txt.tmp")
      Files.writeString(tmp, buf.mkString("", "\n", "\n"))
      Files.move(tmp, dir.resolve(s"udp_$seq.txt"),
        StandardCopyOption.ATOMIC_MOVE)
      seq += 1
      buf.clear()
    }

    def close(): Unit = {
      running = false
      socket.close()
      thread.join(2000)
      if (buf.nonEmpty) flush()
    }
  }

  /** Listen on `port` (0 = ephemeral) and land datagrams into `landingDir`
    * as newline-framed text files every `flushEvery` messages (or 250 ms
    * of quiet). Run one relay per ingest host, like the reference runs one
    * udp_source process per worker.
    */
  def start(port: Int, landingDir: String, flushEvery: Int = 64): Relay = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val socket = new DatagramSocket(port)
    socket.setSoTimeout(250)
    val relay = new Relay(socket, dir, flushEvery)
    relay.thread.setDaemon(true)
    relay.thread.start()
    relay
  }
}

/** UDP source config: the landing directory fed by [[UdpIngest]] relays,
  * tailed as a text stream — one `value: string` row per datagram.
  */
case class UdpSourceConfig(name: String, landingDir: String,
    maxFilesPerTrigger: Option[Int] = None) extends StreamSource {
  def format: String = "text"
  def options: Map[String, String] =
    Map("path" -> landingDir) ++
      maxFilesPerTrigger.map("maxFilesPerTrigger" -> _.toString)
  override def schema: Option[StructType] =
    Some(StructType(Seq(StructField("value", StringType))))
}

/** UDP sink (reference connectors/udp_sink): the first column of each row
  * is sent as one UTF-8 datagram from the executor that owns the row.
  */
case class UdpSinkConfig(host: String, port: Int) extends StreamSink {
  def writer(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.foreach(new ForeachWriter[Row] {
      @transient private var socket: DatagramSocket = _
      @transient private var addr: InetAddress = _
      def open(partitionId: Long, epochId: Long): Boolean = {
        socket = new DatagramSocket()
        addr = InetAddress.getByName(host)
        true
      }
      def process(row: Row): Unit = {
        val bytes = String.valueOf(row.get(0)).getBytes(StandardCharsets.UTF_8)
        socket.send(new DatagramPacket(bytes, bytes.length, addr, port))
      }
      def close(errorOrNull: Throwable): Unit =
        if (socket != null) socket.close()
    })
}

/** Object-store sink (reference connectors/s3_bucket_sink): rows of
  * `(key string, body string|binary)` are PUT as objects `baseUri/key`.
  * `baseUri` is any Hadoop filesystem — `s3a://bucket`, `hdfs://...`,
  * `file:/...` — resolved on the EXECUTORS, one connection per partition.
  * Replay-idempotent: a re-run epoch re-PUTs the same keys.
  */
case class ObjectStoreSinkConfig(baseUri: String, checkpoint: String)
    extends StreamSink {

  def writer(df: DataFrame): DataStreamWriter[Row] = {
    val base = baseUri.stripSuffix("/")
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => putBatch(batch, base) }
  }

  /** One PUT per row, from the partition that owns it. */
  private def putBatch(batch: DataFrame, base: String): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = batch.select(
      col("key").cast("string"), col("body").cast("binary"))
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conf = new org.apache.hadoop.conf.Configuration()
        val fs = org.apache.hadoop.fs.FileSystem.get(new URI(base), conf)
        it.foreach { r =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(s"$base/${r.getString(0)}"), true)
          try out.write(r.getAs[Array[Byte]](1))
          finally out.close()
        }
      }
    }
  }
}
