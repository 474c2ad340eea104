package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Max element multiplicity of an `array<string>` — the per-document
  * inner loop of the repetition quality signals (the count of the most
  * frequent n-gram). The column-expression formulation (array_sort +
  * an `aggregate` run-length scan) interprets ~2 Catalyst node
  * evaluations per element per lambda step; this is a single hash-count
  * loop in straight Java, O(n) with no sort at all. Null elements are
  * SKIPPED (an all-null array counts 0); a null array is null. That is
  * the intended semantic — the sorted-run HOF formulation instead
  * treats a null element as a run of length 1 (its `x === prev` lambda
  * never matches), an artifact, so the two agree on null-free arrays
  * only (which is what gram builders produce; equality asserted on
  * random null-free inputs in MaxMultiplicityExprSpec).
  */
case class MaxMultiplicity(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_maxmult expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_maxmult"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[AnyRef, Integer]()
    var best = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = counts.get(k)
        val nc = if (c == null) 1 else c.intValue() + 1
        counts.put(k, Integer.valueOf(nc))
        if (nc > best) best = nc
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val best = ctx.freshName("best")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val nc = ctx.freshName("nc")
      s"""
         |final int $n = $x.numElements();
         |final java.util.HashMap $m = new java.util.HashMap();
         |long $best = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    Object $k = $x.getUTF8String($i);
         |    Object $c = $m.get($k);
         |    int $nc = ($c == null) ? 1 : ((java.lang.Integer) $c).intValue() + 1;
         |    $m.put($k, java.lang.Integer.valueOf($nc));
         |    if ($nc > $best) $best = $nc;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicity =
    copy(child = newChild)
}
