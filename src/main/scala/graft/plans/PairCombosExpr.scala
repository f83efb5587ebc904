package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All index-ordered pairs `(arr(i), arr(j)), i < j` of a bigint array as
  * `array<struct<a,b>>` — the codegen'd generalization of
  * [[AdjacentPairs]] from adjacent to ALL pairs. Feed it a
  * `sort_array(collect_set(...))` group and `explode` the result: one
  * aggregate shuffle + a map-side expansion replaces the classic
  * distinct + self-join + distinct pair build (two extra shuffles of the
  * widest intermediates) for co-occurrence edges.
  *
  * Fan-out is quadratic in the array length, so callers must bound the
  * group width (order baskets are naturally small; prune or slice wide
  * groups first — exactly the downward-closure discipline the basket
  * miner documents). Null elements are skipped.
  */
case class PairCombos(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_combos requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    PairCombos.checkWidth(n)
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = arr.getLong(i)
        var j = i + 1
        while (j < n) {
          if (!arr.isNullAt(j)) {
            out.add(new GenericInternalRow(
              Array[Any](a, arr.getLong(j))))
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val tmp = ctx.freshName("tmp")
      val gir = classOf[GenericInternalRow].getName
      val gad = classOf[GenericArrayData].getName
      val pc = PairCombos.getClass.getName.stripSuffix("$")
      // no Janino autoboxing: box the longs explicitly. Width-check BEFORE
      // sizing: n*(n-1)/2 in int arithmetic goes negative past ~46341
      // elements (NegativeArraySizeException) while the interpreted path
      // (ArrayList) would proceed — both modes must fail identically.
      s"""
         |int $n = $arr.numElements();
         |$pc.checkWidth($n);
         |Object[] $out = new Object[$n * ($n - 1) / 2];
         |int $k = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    for (int $j = $i + 1; $j < $n; $j++) {
         |      if (!$arr.isNullAt($j)) {
         |        $out[$k++] = new $gir(new Object[] {
         |          java.lang.Long.valueOf($arr.getLong($i)),
         |          java.lang.Long.valueOf($arr.getLong($j)) });
         |      }
         |    }
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

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
  override def prettyName: String = "pair_combos"
}

object PairCombos {
  /** Widest group the expression accepts: past this the pair fan-out
    * (n*(n-1)/2 ≈ 1B rows at 46k elements) is a caller bug, not a query —
    * and the codegen'd int size arithmetic would overflow negative. One
    * shared guard keeps codegen and interpreted eval failure-identical.
    */
  val MaxWidth = 46340

  def checkWidth(n: Int): Unit =
    if (n > MaxWidth) throw new IllegalArgumentException(
      s"pair_combos: array has $n elements (max $MaxWidth); " +
        s"the ${n.toLong * (n - 1) / 2}-pair fan-out of a group this wide " +
        "must be bounded upstream (slice or prune the group first)")

  def pairs(arr: Column): Column =
    org.apache.spark.sql.functions.call_function("pair_combos", arr)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pair_combos", exprs => PairCombos(exprs.head), "built-in")
}
