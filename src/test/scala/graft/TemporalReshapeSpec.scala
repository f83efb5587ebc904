package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.sources.Sources

/** Specs for the round's temporal/reshape/fuzzy-match additions:
  * edit-join losslessness vs brute force, incremental-state merge vs
  * full recompute under different splits, SCD2 interval invariants, and
  * itemset downward-closure consistency.
  */
class TemporalReshapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("editJoin: prefix-filtered candidates equal brute-force ed<=2 pairs") {
    import spark.implicits._
    val filtered = EditDist.qEditJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same normalized 48-char keys
    val keys = Sources.documents(spark, sf)
      .select($"doc_id",
        substring(regexp_replace(lower($"text"), "[^a-z0-9]+", " "), 1, 48)
          .as("s"))
      // the operator's documented contract: keys need >= 7 grams (>= 9
      // chars) for the prefix filter to be lossless
      .filter(length($"s") >= 9)
    val brute = keys.as("a").crossJoin(keys.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.s"), col("b.s")).cast("long").as("ed"))
      .filter($"ed" <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(filtered == brute)
    assert(brute.nonEmpty, "test data should contain near-identical prefixes")
  }

  test("incremental agg: state merge equals full recompute for any cutoff") {
    import spark.implicits._
    val full = Temporal.qIncrementalAgg(spark, sf).collect()
    // the query's own result must equal a direct one-pass aggregate
    val direct = Sources.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(27,6)")).cast("double").as("total_price"),
        (sum($"o_totalprice".cast("decimal(27,6)")).cast("double") / count(lit(1)))
          .as("avg_price"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
      .orderBy($"o_orderpriority")
      .collect()
    assert(full.map(_.toSeq) sameElements direct.map(_.toSeq))
  }

  test("scd2: versions tile each user's history without gaps or overlap") {
    import spark.implicits._
    val rows = Temporal.qScd2(spark, sf)
      .select($"user_id", $"version", $"valid_from_s", $"valid_to_s")
      .collect()
      .groupBy(_.getLong(0))
    rows.foreach { case (user, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i + 1, s"user $user version numbering")
        if (i + 1 < sorted.length)
          assert(r.getLong(3) == sorted(i + 1).getLong(2),
            s"user $user versions must tile")
        else assert(r.isNullAt(3), s"user $user last version must be open")
      }
    }
  }

  test("itemsets: every reported pair is jointly frequent and support-bounded") {
    import spark.implicits._
    val out = Itemsets.qItemsets(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, confAb, confBa, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n >= 100)
      assert(confAb > 0 && confAb <= 1000000)
      assert(confBa > 0 && confBa <= 1000000)
      assert(lift > 0)
    }
  }
}
