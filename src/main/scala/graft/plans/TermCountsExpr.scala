package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass query-term counting over a token array: returns a struct
  * `{n: n_tokens, t0: tf(terms(0)), …, t{k-1}: tf(terms(k-1))}`.
  *
  * This is the BM25 hot-path primitive: the composition it replaces —
  * `size(toks)` plus one `size(filter(toks, _ === t))` per term — re-runs
  * the interpreted lambda (and re-inlines the token-split that feeds it)
  * once per term, and the explode + conditional-aggregate alternative
  * pushes every token through a shuffle-side hash aggregate. Here a
  * document's tokens are traversed exactly once inside whole-stage
  * codegen and scoring stays a pure zero-shuffle projection.
  * (Reference behavior: wallaroo apps compute per-key counts in one
  * stateful pass, e.g. examples/python/word_count/word_count.py.)
  *
  * The output is a STRUCT (not array<bigint>) deliberately: struct field
  * access on a non-nullable input is non-nullable, while array indexing
  * is always nullable (out-of-bounds) — nullable outputs invite inferred
  * `isnotnull` constraint filters that get pushed below the projection
  * and re-inline this whole expression once per consumed field.
  */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(
    StructField("n", LongType, nullable = false) +:
      terms.indices.map(i => StructField(s"t$i", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](termBytes.length + 1)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]],
      java.lang.Long.valueOf(0L))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(0) = out(0).asInstanceOf[Long] + 1L
        val w = arr.getUTF8String(i)
        var j = 0
        while (j < termBytes.length) {
          if (termBytes(j).equals(w))
            out(j + 1) = out(j + 1).asInstanceOf[Long] + 1L
          j += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      val boxed = ctx.freshName("boxed")
      val utf8 = classOf[UTF8String].getName
      // NOTE: the type must be Java SOURCE syntax ("UTF8String[]") —
      // classOf[Array[...]].getName yields the JVM binary name
      // ("[L...;"), which Janino rejects and Spark silently downgrades
      // to interpreted evaluation (locked by the CODEGEN_ONLY spec)
      val termsRef = ctx.addReferenceObj("termBytes", termBytes, s"$utf8[]")
      val gir = classOf[GenericInternalRow].getName
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$termsRef.length + 1];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    $out[0]++;
         |    $utf8 $w = $arr.getUTF8String($i);
         |    for (int $j = 0; $j < $termsRef.length; $j++) {
         |      if ($termsRef[$j].equals($w)) $out[$j + 1]++;
         |    }
         |  }
         |}
         |Object[] $boxed = new Object[$out.length];
         |for (int $j = 0; $j < $out.length; $j++) {
         |  $boxed[$j] = java.lang.Long.valueOf($out[$j]);
         |}
         |${ev.value} = new $gir($boxed);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
  override def prettyName: String = "term_counts"
}

object TermCounts {
  def termCounts(tokens: Column): Column =
    org.apache.spark.sql.functions.call_function("term_counts", tokens)

  /** Register with a fixed query-term list. */
  def register(spark: SparkSession, terms: Seq[String]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "term_counts", exprs => TermCounts(exprs.head, terms), "built-in")
}
