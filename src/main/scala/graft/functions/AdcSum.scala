package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** Native fused PQ asymmetric-distance lookup-sum:
  * `graft_adc(codes, qtab) = Σ_m qtab[m][codes[m]]`.
  *
  * The composable form — `aggregate(sequence(0, M-1), 0L, (acc, m) ->
  * acc + element_at(element_at(qtab, m), element_at(codes, m + 1)))` —
  * evaluates an interpreted higher-order lambda per subspace per
  * candidate row with boxed accumulation; this expression is the same
  * semantics as ONE fused loop inside whole-stage codegen — the
  * per-candidate kernel of the IVF-PQ ADC scan (s16), which at 100 TB
  * runs once per (probed-cell member × query) and is exactly the
  * memory-bandwidth-bound loop PQ exists for (`ext/SimilarityQueries
  * .scala` s16; the faiss IVFADC inner loop).
  *
  * Lookups are BY KEY VALUE on both map levels (the r13 sparse-code-id
  * contract — never positional); map widths here are PqSub=8 and
  * NumCells=16, so the linear key scans stay register-friendly.
  * NULL contract (STRICTER than the fold where they differ — every
  * divergence fails loud, never a silently perfect or partial
  * distance): a missing m-key, missing code, null entry, EMPTY
  * inputs, or a codes array whose length differs from the
  * subspace-table count all yield NULL. The fold summed the first
  * PqSub lookups of an overlong codes array and s16's coalesce would
  * have scored an empty pair as a perfect 0 distance; both now
  * surface through s16's raise_error instead.
  */
case class AdcSum(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            MapType(IntegerType, MapType(LongType, LongType, _), _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, MAP<INT, MAP<BIGINT, " +
        s"BIGINT>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val qtab = b.asInstanceOf[MapData]
    val n = codes.numElements()
    if (n == 0 || n != qtab.numElements()) return null
    val mk = qtab.keyArray()
    val mv = qtab.valueArray()
    var acc = 0L
    var m = 0
    while (m < n) {
      if (codes.isNullAt(m)) return null
      val code = codes.getLong(m)
      var mi = -1
      var j = 0
      while (mi < 0 && j < mk.numElements()) {
        if (mk.getInt(j) == m) mi = j
        j += 1
      }
      if (mi < 0 || mv.isNullAt(mi)) return null
      val mrow = mv.getMap(mi)
      val rk = mrow.keyArray()
      val rv = mrow.valueArray()
      var ci = -1
      j = 0
      while (ci < 0 && j < rk.numElements()) {
        if (rk.getLong(j) == code) ci = j
        j += 1
      }
      if (ci < 0 || rv.isNullAt(ci)) return null
      acc += rv.getLong(ci)
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ad = classOf[ArrayData].getName
      val md = classOf[MapData].getName
      val n = ctx.freshName("n")
      val mk = ctx.freshName("mk")
      val mv = ctx.freshName("mv")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val mi = ctx.freshName("mi")
      val code = ctx.freshName("code")
      val mrow = ctx.freshName("mrow")
      val rk = ctx.freshName("rk")
      val rv = ctx.freshName("rv")
      val ci = ctx.freshName("ci")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final $ad $mk = $b.keyArray();
         |  final $ad $mv = $b.valueArray();
         |  long $acc = 0L;
         |  for (int $m = 0; $m < $n; $m++) {
         |    if ($a.isNullAt($m)) { ${ev.isNull} = true; break; }
         |    final long $code = $a.getLong($m);
         |    int $mi = -1;
         |    for (int $j = 0; $mi < 0 && $j < $mk.numElements(); $j++) {
         |      if ($mk.getInt($j) == $m) $mi = $j;
         |    }
         |    if ($mi < 0 || $mv.isNullAt($mi)) { ${ev.isNull} = true; break; }
         |    final $md $mrow = $mv.getMap($mi);
         |    final $ad $rk = $mrow.keyArray();
         |    final $ad $rv = $mrow.valueArray();
         |    int $ci = -1;
         |    for (int $j = 0; $ci < 0 && $j < $rk.numElements(); $j++) {
         |      if ($rk.getLong($j) == $code) $ci = $j;
         |    }
         |    if ($ci < 0 || $rv.isNullAt($ci)) { ${ev.isNull} = true; break; }
         |    $acc += $rv.getLong($ci);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
