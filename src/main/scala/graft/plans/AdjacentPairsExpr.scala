package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-pair extraction: `[a,b,c] → ["a b","b c"]` — the bigram shape
  * behind BPE pair counting and collocation mining. Semantically identical
  * to the `zip_with(arr, slice(arr,2,n-1), concat_ws) + filter` composition
  * but one primitive pass per row with a single output allocation, inside
  * whole-stage codegen (the §5b native-expression tier). Null elements are
  * skipped pairwise (no pair is emitted with a null side), matching the
  * concat_ws null-drop + contains-space filter of the composition for
  * null-free inputs.
  */
case class AdjacentPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adjacent_pairs requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new java.util.ArrayList[AnyRef](math.max(n - 1, 0))
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < n - 1) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
        out.add(UTF8String.concat(arr.getUTF8String(i), sep,
          arr.getUTF8String(i + 1)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val sep = ctx.freshName("sep")
      val tmp = ctx.freshName("tmp")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $arr.numElements();
         |Object[] $out = new Object[$n > 1 ? $n - 1 : 0];
         |$utf8 $sep = $utf8.fromString(" ");
         |int $k = 0;
         |for (int $i = 0; $i < $n - 1; $i++) {
         |  if (!$arr.isNullAt($i) && !$arr.isNullAt($i + 1)) {
         |    $out[$k++] = $utf8.concat(
         |      $arr.getUTF8String($i), $sep, $arr.getUTF8String($i + 1));
         |  }
         |}
         |if ($k < $out.length) {
         |  Object[] $tmp = new Object[$k];
         |  System.arraycopy($out, 0, $tmp, 0, $k);
         |  $out = $tmp;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
  override def prettyName: String = "adjacent_pairs"
}

object AdjacentPairs {
  def pairs(tokens: Column): Column =
    org.apache.spark.sql.functions.call_function("adjacent_pairs", tokens)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adjacent_pairs", exprs => AdjacentPairs(exprs.head), "built-in")
}
