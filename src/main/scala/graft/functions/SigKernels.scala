package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fused codegen kernels for the two remaining interpreted per-row
  * signature computations (optimization round r19, guide §4):
  *
  *   - [[MinHashSig]] (`graft_minhash`): the d03/d26 MinHash signature —
  *     16 × `array_min(transform(hs, h -> (h*a_j + b_j) % p))` interpreted
  *     lambdas per document (16 passes over the shingle array, one
  *     intermediate array each) fused into ONE pass emitting all 16 mins.
  *   - [[Sq8Quantize]] (`graft_sq8`): the SQ8 quantization that feeds
  *     every quantized similarity entry — `array_max(transform(|x|))` +
  *     `transform(floor(x*127/maxabs))` (two interpreted lambdas, two
  *     intermediate arrays per vector) fused into one two-phase loop.
  *
  * Like the r18 DotKernels, semantics are IDENTICAL to the higher-order
  * folds they replace (same arithmetic widths and order, same
  * null-element skipping as array_min/array_max, same NULL/empty edge
  * cases), so oracle results stay bit-identical — pinned by
  * SigKernelSpec's property tests against the literal composable forms.
  */
object SigKernels {
  /** Evaluate a foldable ARRAY<BIGINT> argument at construction — the
    * kernel coefficients are compile-time literals; capturing them here
    * keeps the generated loop free of per-row ArrayData indirection. */
  private[functions] def litLongArray(e: Expression, what: String): Seq[Long] = {
    require(e.foldable, s"$what must be a literal array")
    e.eval() match {
      case a: ArrayData => a.toLongArray().toSeq
      case other => throw new IllegalArgumentException(
        s"$what must be a non-null ARRAY<BIGINT> literal, got $other")
    }
  }

  private[functions] def litLong(e: Expression, what: String): Long = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
      case other => throw new IllegalArgumentException(
        s"$what must be a non-null integral literal, got $other")
    }
  }
}

/** `graft_minhash(hs, a, b, p)` — ARRAY<BIGINT> of k = |a| MinHash
  * signature values over the hashed-shingle array `hs`: element j is
  * `min over non-null h in hs of (h*a(j) + b(j)) % p`, exactly
  * `array_min(transform(hs, h -> (h*a(j)+b(j)) % p))` for each j but in
  * ONE fused pass (the fold form is 16 interpreted lambda passes with an
  * intermediate array each — the dominant per-row term of the minhash
  * family at scale). Null elements are skipped like array_min; an empty
  * or all-null `hs` yields an array of k NULLs (array_min of an
  * empty/all-null transform is NULL); a NULL `hs` yields NULL. Overflow
  * follows the session's ANSI setting exactly like the fold's
  * Multiply/Add (unreachable for the 32-bit shingle hashes and small
  * coefficients the entries use — the parity is for the drop-in
  * contract, not the data). */
case class MinHashSig(child: Expression, coeffA: Seq[Long], coeffB: Seq[Long],
                      p: Long, failOnError: Boolean)
  extends UnaryExpression {

  def this(child: Expression, a: Expression, b: Expression, p: Expression) =
    this(child,
      SigKernels.litLongArray(a, "graft_minhash coefficient array"),
      SigKernels.litLongArray(b, "graft_minhash offset array"),
      SigKernels.litLong(p, "graft_minhash modulus"),
      org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)

  require(coeffA.nonEmpty && coeffA.length == coeffB.length,
    "graft_minhash requires non-empty, equal-length coefficient arrays")
  require(p != 0, "graft_minhash modulus must be non-zero")

  private val k = coeffA.length
  @transient private lazy val aArr: Array[Long] = coeffA.toArray
  @transient private lazy val bArr: Array[Long] = coeffB.toArray

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val mins = new Array[Long](k)
    var any = false
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val h = x.getLong(i)
        var j = 0
        while (j < k) {
          val v =
            if (failOnError)
              Math.addExact(Math.multiplyExact(h, aArr(j)), bArr(j)) % p
            else (h * aArr(j) + bArr(j)) % p
          if (!any || v < mins(j)) mins(j) = v
          j += 1
        }
        any = true
      }
      i += 1
    }
    if (any) UnsafeArrayData.fromPrimitiveArray(mins)
    else new GenericArrayData(new Array[Any](k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val any = ctx.freshName("any")
      val mins = ctx.freshName("mins")
      val step =
        if (failOnError)
          s"java.lang.Math.addExact(java.lang.Math.multiplyExact($h, " +
            s"$aRef[$j]), $bRef[$j]) % ${p}L"
        else s"($h * $aRef[$j] + $bRef[$j]) % ${p}L"
      s"""
         |final int $n = $c.numElements();
         |final long[] $mins = new long[$k];
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  final long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = $step;
         |    if (!$any || $v < $mins[$j]) $mins[$j] = $v;
         |  }
         |  $any = true;
         |}
         |${ev.value} = $any
         |  ? (org.apache.spark.sql.catalyst.util.ArrayData)
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |        .fromPrimitiveArray($mins)
         |  : (org.apache.spark.sql.catalyst.util.ArrayData)
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |        new Object[$k]);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_sq8(embedding)` — the SQ8 quantization codes of an
  * ARRAY<FLOAT> vector as ARRAY<BIGINT>: with
  * `maxabs = array_max(transform(emb, x -> abs(double(x))))`, element i
  * is `0` when `maxabs = 0.0`, else `floor(double(x_i) * 127.0 /
  * maxabs)` — exactly the two chained transforms it replaces, fused into
  * one two-phase loop (no interpreted lambda dispatch, no intermediate
  * |x| array). Edge parity with the fold form:
  *   - null elements are skipped by the max (array_max semantics) and
  *     quantize to NULL — except under `maxabs = 0.0`, where the
  *     `when(maxabs = 0, 0)` branch makes EVERY element 0;
  *   - an empty or all-null vector has NULL maxabs, so every element
  *     quantizes to NULL (empty in, empty out);
  *   - NaN elements make maxabs NaN (array_max: NaN is greatest);
  *     `NaN = 0.0` is false and `(long) floor(x*127/NaN)` is 0 — the
  *     same values the when/floor chain produces;
  *   - a NULL vector yields NULL. */
case class Sq8Quantize(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_sq8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var max = 0.0
    var has = false
    var nulls = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) nulls += 1
      else {
        val v = Math.abs(x.getFloat(i).toDouble)
        if (!has) { max = v; has = true }
        else if (java.lang.Double.isNaN(v) || v > max) max = v
      }
      i += 1
    }
    if (!has) new GenericArrayData(new Array[Any](n)) // NULL maxabs: all NULL
    else if (max == 0.0) UnsafeArrayData.fromPrimitiveArray(new Array[Long](n))
    else if (nulls == 0) {
      val out = new Array[Long](n)
      var i2 = 0
      while (i2 < n) {
        out(i2) = Math.floor(x.getFloat(i2).toDouble * 127.0 / max).toLong
        i2 += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var i2 = 0
      while (i2 < n) {
        if (!x.isNullAt(i2))
          out(i2) = Math.floor(x.getFloat(i2).toDouble * 127.0 / max).toLong
        i2 += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val i2 = ctx.freshName("i2")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val max = ctx.freshName("max")
      val has = ctx.freshName("has")
      val nulls = ctx.freshName("nulls")
      val outL = ctx.freshName("outL")
      val outO = ctx.freshName("outO")
      val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      s"""
         |final int $n = $c.numElements();
         |double $max = 0.0;
         |boolean $has = false;
         |int $nulls = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) { $nulls++; continue; }
         |  final double $v = java.lang.Math.abs((double) $c.getFloat($i));
         |  if (!$has) { $max = $v; $has = true; }
         |  else if (java.lang.Double.isNaN($v) || $v > $max) $max = $v;
         |}
         |if (!$has) {
         |  ${ev.value} = ($ad) new $gad(new Object[$n]);
         |} else if ($max == 0.0) {
         |  ${ev.value} = ($ad) $uad.fromPrimitiveArray(new long[$n]);
         |} else if ($nulls == 0) {
         |  final long[] $outL = new long[$n];
         |  for (int $i2 = 0; $i2 < $n; $i2++) {
         |    $outL[$i2] = (long) java.lang.Math.floor(
         |      ((double) $c.getFloat($i2)) * 127.0 / $max);
         |  }
         |  ${ev.value} = ($ad) $uad.fromPrimitiveArray($outL);
         |} else {
         |  final Object[] $outO = new Object[$n];
         |  for (int $i2 = 0; $i2 < $n; $i2++) {
         |    if (!$c.isNullAt($i2)) $outO[$i2] = (Long) ((long)
         |      java.lang.Math.floor(((double) $c.getFloat($i2)) * 127.0 / $max));
         |  }
         |  ${ev.value} = ($ad) new $gad($outO);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
