package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table readers over the engine's canonical parquet layout.
  *
  * Mirrors the reference's source stage (wallaroo `Wallaroo.source`,
  * /root/reference/lib/wallaroo/application.pony:40) for batch inputs:
  * each named table is one scan whose filters/projections Catalyst pushes
  * into the parquet reader. Streaming sources live in [[graft.streaming]].
  */
object Sources {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Normalizes an event-time `ts` column regardless of how the Spark
    * version at hand surfaced parquet TIMESTAMP(NANOS):
    *
    *   - Spark ≤4.0 with `spark.sql.legacy.parquet.nanosAsLong`: the column
    *     reads as raw long nanos → truncate to µs (exact integer division,
    *     matching engines that truncate ns to µs) and build a timestamp.
    *   - Spark ≥4.1 (flag removed): the column infers as TIMESTAMP_NTZ —
    *     already time-typed, leave it (session TZ is pinned to UTC so NTZ
    *     and instant semantics coincide for our data).
    *
    * Works on batch AND streaming DataFrames; every consumer of `events.ts`
    * must go through this (or [[events]]) rather than assuming a raw type.
    */
  def normalizeTs(raw: DataFrame, col: String = "ts"): DataFrame =
    raw.schema(col).dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(col, org.apache.spark.sql.functions
          .expr(s"timestamp_micros($col div 1000)"))
      case _ => raw
    }

  /** Events table with `ts` normalized to a timestamp type; see
    * [[normalizeTs]] for the per-Spark-version shapes handled.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
