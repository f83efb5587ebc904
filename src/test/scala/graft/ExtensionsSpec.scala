package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point makes every graft native
  * function SQL-callable with zero per-module registration.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("graft.ext.GraftExtensions injects the native function surface") {
    // extensions only apply at session CREATION — drop any session another
    // suite left active (suites run sequentially in the forked test JVM;
    // later suites re-create via getOrCreate)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions"))
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val row = spark.sql(
        """SELECT
          |  simhash64(array('a','b')) AS s64,
          |  simhash_bits(array(CAST(5 AS BIGINT))) AS sbits,
          |  size(shingle_hashes('one two three four')) AS nsh,
          |  size(token_hashes('one one two')) AS ntok,
          |  size(sign_proj_keys(array(CAST(1.0 AS FLOAT)))) AS nkeys,
          |  vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
          |  vec_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
          |          array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS dot
          |""".stripMargin).head
      assert(row.getLong(0) != 0L)
      assert(row.getLong(1) == 5L)   // single hash 5 votes its own bits
      assert(row.getInt(2) == 2)     // two 3-gram shingles
      assert(row.getInt(3) == 3)     // duplicates kept
      assert(row.getInt(4) == 8)     // 8 band keys
      assert(math.abs(row.getDouble(5) - 1.0) < 1e-12)
      assert(row.getDouble(6) == 23.0)
      val aggs = spark.sql(
        """SELECT size(minhash_sig(h)) AS sig, hll_distinct(h) AS hll,
          |  topkd(CAST(h AS DOUBLE), h) AS tk
          |FROM VALUES (CAST(1 AS BIGINT)), (2), (3), (2) t(h)""".stripMargin).head
      assert(aggs.getInt(0) == 64)
      assert(aggs.getLong(1) == 3L)
      // topkd: score desc with id-asc ties — (3,3),(2,2),(2,2),(1,1)
      val tk = aggs.getSeq[org.apache.spark.sql.Row](2)
        .map(r => (r.getDouble(0), r.getLong(1)))
      assert(tk == Seq((3.0, 3L), (2.0, 2L), (2.0, 2L), (1.0, 1L)), tk)
    } finally spark.stop()
  }
}
