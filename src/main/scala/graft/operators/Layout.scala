package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout tools for the 100 TB tier: bucketed tables make every
  * future equi-join/aggregation on the bucket key SHUFFLE-FREE — the
  * shuffle is paid once at write time, then each of the N downstream
  * joins reads co-located buckets (Spark plans a SortMergeJoin with no
  * Exchange when both sides are bucketed by the join key with the same
  * bucket count). This is the batch analogue of the reference's
  * key-partitioned state placement (lib/wallaroo/core/partitioning/):
  * route once, compute locally thereafter.
  *
  * Use for fact tables joined repeatedly on one key (orders⋈lineitem on
  * orderkey, corpus⋈signatures on doc_id). Pair with sortBy on the same
  * key so merge-join needs no per-query sort either.
  */
object Layout {

  /** Persist `df` as a bucketed+sorted parquet TABLE (bucketing metadata
    * lives in the catalog, so this is saveAsTable, not a path write).
    */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // Overwrite replaces a REGISTERED table, but a stale location left by
    // a previous session (different warehouse dir, crashed run) fails
    // with LOCATION_ALREADY_EXISTS — drop both the entry and the path.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }
}
