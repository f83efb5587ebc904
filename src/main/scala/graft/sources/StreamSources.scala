package graft.sources

import java.net.Socket
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Pluggable streaming-source configs — the Spark reading of the
  * reference's source-config family (kafka_source/kafka_source_config.pony,
  * tcp_source/tcp_source_config.pony, connector_source/
  * connector_source_config.pony, gen_source): each config is a pure value
  * that resolves to a `readStream` (format, options, schema), so the
  * surface is inspectable and testable without the transport being up, and
  * `load` is one call. Partitioning, offsets, and recovery are Spark's
  * (the coordinator/notify actor machinery of the reference collapses into
  * the Structured Streaming runtime).
  */
trait StreamSource extends Serializable {
  /** Source name (reference `SourceName`). */
  def name: String
  def format: String
  def options: Map[String, String]
  def schema: Option[StructType] = None
  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream.format(format).options(options)
    schema.fold(reader)(s => reader.schema(s)).load()
  }
}

/** Kafka source (reference kafka_source_config.pony KafkaConfigOptions:
  * topic + brokers + offset reset + per-poll limits). The env ships no
  * Kafka broker or connector jar, so the contract here is the OPTION
  * SURFACE — asserted by test — with `load` working wherever
  * spark-sql-kafka is on the classpath.
  */
case class KafkaSourceConfig(name: String, brokers: Seq[String], topic: String,
    startingOffsets: String = "latest",
    maxOffsetsPerTrigger: Option[Long] = None,
    failOnDataLoss: Boolean = true,
    extra: Map[String, String] = Map.empty) extends StreamSource {
  def format: String = "kafka"
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers.mkString(","),
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "failOnDataLoss" -> failOnDataLoss.toString) ++
    maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++ extra
}

/** TCP/socket source (reference tcp_source_config.pony host:port) — maps
  * to Spark's socket source: one `value: string` line per message.
  */
case class TcpSourceConfig(name: String, host: String, port: Int)
    extends StreamSource {
  def format: String = "socket"
  def options: Map[String, String] =
    Map("host" -> host, "port" -> port.toString)
}

/** Generator source (reference gen_source): `rowsPerSecond` synthetic rows
  * with `timestamp` + monotonically increasing `value`.
  */
case class GenSourceConfig(name: String, rowsPerSecond: Int)
    extends StreamSource {
  def format: String = "rate"
  def options: Map[String, String] =
    Map("rowsPerSecond" -> rowsPerSecond.toString)
}

/** Connector source demo (reference connector_source/ and the connectors
  * directory — kinesis, rabbitmq, redis, s3, udp): an
  * at-least-once directory queue — external connectors land files in a
  * directory, the stream tails it. `fileFormat` json/csv/parquet; schema
  * required (streaming file sources can't infer).
  */
case class DirectoryQueueSourceConfig(name: String, path: String,
    fileFormat: String, fileSchema: StructType,
    maxFilesPerTrigger: Option[Int] = None) extends StreamSource {
  def format: String = fileFormat
  def options: Map[String, String] =
    Map("path" -> path) ++
      maxFilesPerTrigger.map("maxFilesPerTrigger" -> _.toString)
  override def schema: Option[StructType] = Some(fileSchema)
}

/** Streaming sink configs — reference sink/kafka_sink/, sink/tcp_sink/.
  * Each resolves a `DataStreamWriter` so the option surface is testable
  * without the transport.
  */
trait StreamSink extends Serializable {
  def writer(df: DataFrame): DataStreamWriter[Row]
  def start(df: DataFrame): StreamingQuery = writer(df).start()
}

/** Kafka sink (reference kafka_sink_config.pony): expects a `value` column
  * (and optional `key`/`topic` columns per Spark's Kafka sink contract).
  */
case class KafkaSinkConfig(brokers: Seq[String], topic: String,
    checkpoint: String, extra: Map[String, String] = Map.empty)
    extends StreamSink {
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers.mkString(","),
    "topic" -> topic,
    "checkpointLocation" -> checkpoint) ++ extra
  def writer(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("kafka").options(options)
}

/** TCP sink (reference tcp_sink/tcp_sink_config.pony — the reference's
  * default transport): newline-framed text over a socket, one connection
  * per partition per epoch via ForeachWriter. The first column is written
  * per row (`cast` upstream to control framing).
  */
case class TcpSinkConfig(host: String, port: Int) extends StreamSink {
  def writer(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.foreach(new ForeachWriter[Row] {
      // raw Writer, NOT PrintWriter: PrintWriter swallows IOExceptions
      // (sets an internal flag), which would let a mid-epoch connection
      // reset commit the epoch and silently lose rows — here a write
      // failure throws and Spark retries the epoch
      @transient private var socket: Socket = _
      @transient private var out: java.io.Writer = _
      def open(partitionId: Long, epochId: Long): Boolean = {
        socket = new Socket(host, port)
        out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          socket.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
        true
      }
      def process(row: Row): Unit = {
        out.write(String.valueOf(row.get(0)))
        out.write('\n')
      }
      def close(errorOrNull: Throwable): Unit = {
        if (out != null) out.flush()
        if (socket != null) socket.close()
      }
    })
}
