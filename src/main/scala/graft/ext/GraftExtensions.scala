package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans._

/** Session-extension entry point: `spark.sql.extensions=graft.ext.GraftExtensions`
  * injects the whole native function surface at session build — SQL and
  * Column users get every graft expression/aggregate without per-module
  * `register` calls (which remain for ad-hoc sessions). This is the
  * idiomatic shipping shape for a Spark library's custom Catalyst pieces.
  *
  * Injected: simhash64, simhash_bits, minhash_sig, hll_distinct,
  * shingle_hashes, token_hashes, sign_proj_keys (with the default
  * hyperplane bank), vec_cosine.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    // whole-operator tier: the sort-merge as-of join planner strategy
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)

    inject("simhash64", "simhash64(array<string>) - 63-bit SimHash of tokens") {
      e => SimHash64(e.head)
    }
    inject("simhash_bits", "simhash_bits(array<bigint>) - 60-bit SimHash of pre-hashed tokens") {
      e => SimHashBits(e.head, 60)
    }
    inject("minhash_sig", "minhash_sig(bigint) - 64-wide OPH MinHash signature aggregate") {
      e => MinHashAgg(e.head, 64).toAggregateExpression()
    }
    inject("hll_distinct", "hll_distinct(bigint) - mergeable HLL distinct-count sketch") {
      e => HllSketchAgg(e.head, 14).toAggregateExpression()
    }
    inject("shingle_hashes", "shingle_hashes(string) - distinct portable-hashed word 3-grams") {
      e => ShingleHashes(e.head, 3)
    }
    inject("token_hashes", "token_hashes(string) - portable-hashed word tokens (dups kept)") {
      e => ShingleHashes(e.head, 1, distinct = false)
    }
    inject("sign_proj_keys", "sign_proj_keys(array<float>) - hyperplane-LSH band keys (8x8)") {
      e => SignProjKeys(e.head, graft.operators.Dedup.hyperplanes.take(64), 8)
    }
    inject("vec_cosine", "vec_cosine(array<float>, array<float>) - one-pass cosine similarity") {
      e => VecCosine(e.head, e(1))
    }
    inject("vec_dot", "vec_dot(array<float>, array<float>) - one-pass dot product (norm-precomputed cosine building block)") {
      e => VecDot(e.head, e(1))
    }
    inject("topkd", "topkd(double score, bigint id) - exact bounded-heap top-10 aggregate (double score, fixed k=10; Scala callers pick k via TopKDoubleAgg.register's topkd_<k>)") {
      e => TopKDoubleAgg(e.head, e(1), 10).toAggregateExpression()
    }
    inject("adjacent_pairs", "adjacent_pairs(array<string>) - space-joined adjacent token pairs") {
      e => AdjacentPairs(e.head)
    }
    inject("winnow_hashes", "winnow_hashes(string) - winnowing fingerprints (k=8, w=4)") {
      e => WinnowHashes(e.head, 8, 4)
    }
    inject("chunk_hashes", "chunk_hashes(string) - content-defined chunk hashes (k=8, mod 64)") {
      e => ChunkHashes(e.head, 8, 64)
    }
    inject("topk", "topk(bigint score, bigint id) - exact bounded-heap top-k aggregate") {
      e => TopKAgg(e.head, e(1), 10).toAggregateExpression()
    }
  }
}
