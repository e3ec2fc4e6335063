package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Smallest COMMON element of two SORTED, DISTINCT `array<long>`
  * columns (null if disjoint/empty) — an allocation-free two-pointer
  * merge inside whole-stage codegen, the [[SortedIntersectSize]]
  * machinery stopped at the first match.
  *
  * This is the canonical-occurrence dedup key of the prefix-filter
  * candidate join ([[graft.operators.Dedup.jaccardPairs]]): a pair
  * sharing m prefix tokens meets m times in the join, and the classic
  * `distinct()` dedup shuffles every occurrence (the r11 sf100 probe
  * measured the occurrence stream alone overflowing the box's scratch
  * at the candidates stage). Keeping a pair ONLY where the join token
  * equals `graft_sorted_first_common(prefix_a, prefix_b)` — both
  * prefix arrays ride the join rows; at threshold 0.9 they hold
  * ~⌈0.1·n⌉+1 ≈ 3 tokens — evaluates each pair exactly once with no
  * dedup shuffle at all, the same shape [[FirstEqualIndex]] gives the
  * MinHash band join. Any deterministic shared-token choice works for
  * dedup; the minimum keeps both sides' arrays in one order (plain
  * ascending) with no secondary key.
  *
  * Null array → NULL. Null ELEMENTS end the scan (array_sort places
  * them last — the [[SortedIntersectSize]] contract).
  */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_first_common expects two array<long> columns, got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_first_common"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) return xv
      else if (xv < yv) i += 1
      else j += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val done = ctx.freshName("done")
      s"""int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |boolean $done = false;
         |${ev.isNull} = true;
         |while (!$done && $i < $nx && $j < $ny &&
         |    !$a.isNullAt($i) && !$b.isNullAt($j)) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.isNull} = false; ${ev.value} = $xv; $done = true; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedFirstCommon = copy(left = l, right = r)
}

object SortedFirstCommon {

  private val fnId = FunctionIdentifier("graft_sorted_first_common")
  private val info = new ExpressionInfo(
    classOf[SortedFirstCommon].getName, "graft_sorted_first_common")
  private[plans] val builder = (children: Seq[Expression]) => {
    require(children.size == 2,
      s"graft_sorted_first_common requires exactly 2 arguments, got ${children.size}")
    SortedFirstCommon(children(0), children(1))
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(fnId)) reg.registerFunction(fnId, info, builder)
  }

  /** Column-API entry. */
  def firstCommonCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_sorted_first_common", a, b)
  }
}
