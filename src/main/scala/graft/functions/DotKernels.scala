package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused codegen kernels for the remaining composable-fold hot paths
  * (optimization round r18, guide §4: eliminate non-codegen expressions
  * in hot paths). Spark's array higher-order functions (`zip_with`,
  * `aggregate`, `transform`) are CodegenFallback: every row pays
  * interpreted lambda dispatch per ELEMENT, plus an intermediate array
  * allocation per `zip_with` — measured as the dominant per-candidate
  * cost of the SQ8/PQ similarity kernels. Each expression here is the
  * [[FloatDot]] pattern applied to one remaining fold shape: one fused
  * loop, no allocation, inside whole-stage codegen, with accumulation
  * order and null/ragged semantics IDENTICAL to the fold it replaces
  * (oracle results stay bit-identical — pinned by DotKernelSpec's
  * property tests against the literal composable form).
  */

/** `graft_ldot(a, b)` — Σ a[i]*b[i] over two ARRAY<BIGINT> columns in
  * 64-bit integer arithmetic, left-to-right. Replaces
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0L, (acc,x) => acc+x)` —
  * the SQ8 integer dot kernel (s06/s08/s09/s12/s13 candidate stages,
  * qn2 self-dots). Overflow follows the session's ANSI setting exactly
  * like the fold's Multiply/Add would: ANSI (Spark 4's default) throws,
  * legacy wraps — `failOnError` is captured at construction, the same
  * pattern as Spark's own BinaryArithmetic. (SQ8 codes are ≤127, so
  * the bound is |Σ| ≤ 127²·dim — overflow is unreachable in the
  * entries; the parity matters for the drop-in contract, not for the
  * data.) Ragged lengths and null elements yield NULL (zip_with pads
  * with nulls; `acc + null` is null). */
case class LongDot(left: Expression, right: Expression,
                   failOnError: Boolean) extends BinaryExpression {

  def this(left: Expression, right: Expression) =
    this(left, right,
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ldot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (failOnError)
        acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      else acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val step =
        if (failOnError)
          s"$acc = java.lang.Math.addExact($acc, " +
            s"java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else s"$acc += $a.getLong($i) * $b.getLong($i);"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $step
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_fddot(a, c)` — Σ (double)a[i] * c[i] over ARRAY<FLOAT> `a`
  * and ARRAY<DOUBLE> `c` (in practice a constant-folded literal: d13's
  * centroids, s05's hyperplanes), left-to-right double accumulation.
  * Replaces `aggregate(zip_with(a, c, (x,p) => x.cast("double") * p),
  * 0.0, (acc,x) => acc+x)`. Ragged lengths and null elements yield
  * NULL, exactly like the fold. */
case class FloatDoubleDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<DOUBLE>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fddot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_fl2(a, b)` — Σ ((double)a[i] − (double)b[i])² over two
  * ARRAY<FLOAT> columns, left-to-right double accumulation. Replaces
  * `aggregate(zip_with(a, b, (x,y) => (xd−yd)*(xd−yd)), 0.0,
  * (acc,v) => acc+v)` — the PQ subspace L2 kernel (s11/s16 codebook
  * scoring); the caller keeps `round(... * 1e6).cast("long")` in the
  * column layer so the fixed-point contract is untouched. Ragged
  * lengths and null elements yield NULL, exactly like the fold. */
case class FloatL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fl2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
