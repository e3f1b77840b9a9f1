package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused dot product over two `Array[Float]` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) => x*y), 0.0,
  * (acc,x) => acc+x)` — materializes an intermediate array per row and
  * evaluates two higher-order lambdas per element. This expression is
  * the (b)-tier extension point from the build rules (custom Catalyst
  * `Expression` with `doGenCode`): one fused loop, no allocation, inside
  * whole-stage codegen — the hot kernel of cosine top-k and embedding
  * near-dup at 100 TB, where the dot product runs per candidate PAIR.
  *
  * Accumulation is left-to-right in element order, exactly like the
  * `aggregate` fold and DuckDB's `list_sum(list_apply(list_zip(...)))`,
  * so oracle results stay bit-identical. Elements are widened
  * Float→Double before multiply, matching both engines.
  *
  * Edge semantics match the fold exactly: unequal-length arrays and null
  * elements yield NULL (`zip_with` pads the shorter side with nulls and
  * `acc + null` is null) — never a silently truncated or zero-filled
  * dot product.
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // NULL is produced for ragged/null-element inputs even when both
  // input columns are non-nullable.
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
  override def prettyName: String = "graft_fdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native SQL functions — via
  * `SparkSessionExtensions` (`spark.sql.extensions=graft.functions.
  * GraftSparkExtensions`) for externally built sessions, or
  * [[GraftFunctions.ensureRegistered]] at first use for any session. */
class GraftSparkExtensions
  extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.fdotDescriptor)
    ext.injectFunction(GraftFunctions.adcDescriptor)
    ext.injectFunction(GraftFunctions.ldotDescriptor)
    ext.injectFunction(GraftFunctions.fddotDescriptor)
    ext.injectFunction(GraftFunctions.fl2Descriptor)
    ext.injectFunction(GraftFunctions.pairsDescriptor)
    ext.injectFunction(GraftFunctions.minhashDescriptor)
    ext.injectFunction(GraftFunctions.sq8Descriptor)
  }
}

object GraftFunctions {
  private[graft] val fdotDescriptor = (
    FunctionIdentifier("graft_fdot"),
    new ExpressionInfo(classOf[FloatDot].getName, "graft_fdot"),
    (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1)): Expression)

  private[graft] val adcDescriptor = (
    FunctionIdentifier("graft_adc"),
    new ExpressionInfo(classOf[AdcSum].getName, "graft_adc"),
    (exprs: Seq[Expression]) => AdcSum(exprs(0), exprs(1)): Expression)

  private[graft] val ldotDescriptor = (
    FunctionIdentifier("graft_ldot"),
    new ExpressionInfo(classOf[LongDot].getName, "graft_ldot"),
    (exprs: Seq[Expression]) => new LongDot(exprs(0), exprs(1)): Expression)

  private[graft] val fddotDescriptor = (
    FunctionIdentifier("graft_fddot"),
    new ExpressionInfo(classOf[FloatDoubleDot].getName, "graft_fddot"),
    (exprs: Seq[Expression]) => FloatDoubleDot(exprs(0), exprs(1)): Expression)

  private[graft] val fl2Descriptor = (
    FunctionIdentifier("graft_fl2"),
    new ExpressionInfo(classOf[FloatL2].getName, "graft_fl2"),
    (exprs: Seq[Expression]) => FloatL2(exprs(0), exprs(1)): Expression)

  private[graft] val pairsDescriptor = (
    FunctionIdentifier("graft_pairs"),
    new ExpressionInfo(classOf[PairExpand].getName, "graft_pairs"),
    (exprs: Seq[Expression]) => PairExpand(exprs(0)): Expression)

  private[graft] val minhashDescriptor = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    (exprs: Seq[Expression]) =>
      new MinHashSig(exprs(0), exprs(1), exprs(2), exprs(3)): Expression)

  private[graft] val sq8Descriptor = (
    FunctionIdentifier("graft_sq8"),
    new ExpressionInfo(classOf[Sq8Quantize].getName, "graft_sq8"),
    (exprs: Seq[Expression]) => Sq8Quantize(exprs(0)): Expression)

  /** Idempotently register into an existing session (temp function). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_fdot")))
      reg.createOrReplaceTempFunction("graft_fdot",
        exprs => FloatDot(exprs(0), exprs(1)), "scala_udf")
    // fused PQ ADC lookup-sum (s16's per-candidate kernel)
    if (!reg.functionExists(FunctionIdentifier("graft_adc")))
      reg.createOrReplaceTempFunction("graft_adc",
        exprs => AdcSum(exprs(0), exprs(1)), "scala_udf")
    // fused SQ8 integer dot (s06/s08/s09/s12/s13 candidate kernel)
    if (!reg.functionExists(FunctionIdentifier("graft_ldot")))
      reg.createOrReplaceTempFunction("graft_ldot",
        exprs => new LongDot(exprs(0), exprs(1)), "scala_udf")
    // fused float×double-literal dot (d13 centroids, s05 hyperplanes)
    if (!reg.functionExists(FunctionIdentifier("graft_fddot")))
      reg.createOrReplaceTempFunction("graft_fddot",
        exprs => FloatDoubleDot(exprs(0), exprs(1)), "scala_udf")
    // fused squared-L2 (s11/s16 PQ subspace scoring)
    if (!reg.functionExists(FunctionIdentifier("graft_fl2")))
      reg.createOrReplaceTempFunction("graft_fl2",
        exprs => FloatL2(exprs(0), exprs(1)), "scala_udf")
    // bucket-local pair-expansion generator (saltedPairExpansion kernel)
    if (!reg.functionExists(FunctionIdentifier("graft_pairs")))
      reg.createOrReplaceTempFunction("graft_pairs",
        exprs => PairExpand(exprs(0)), "scala_udf")
    // fused MinHash signature (d03/d26 sig relation — 16 mins, one pass)
    if (!reg.functionExists(FunctionIdentifier("graft_minhash")))
      reg.createOrReplaceTempFunction("graft_minhash",
        exprs => new MinHashSig(exprs(0), exprs(1), exprs(2), exprs(3)),
        "scala_udf")
    // fused SQ8 quantization (the relation every quantized entry reads)
    if (!reg.functionExists(FunctionIdentifier("graft_sq8")))
      reg.createOrReplaceTempFunction("graft_sq8",
        exprs => Sq8Quantize(exprs(0)), "scala_udf")
    // raw AggregateFunction: the analyzer wraps it in AggregateExpression
    // itself (and would reject a pre-wrapped one for DISTINCT/FILTER)
    if (!reg.functionExists(FunctionIdentifier("graft_top_k")))
      reg.createOrReplaceTempFunction("graft_top_k",
        exprs => TopKAgg(exprs(0), exprs(1), exprs(2)), "scala_udf")
    // Spark's runtime-filter probe (codegen'd, Predicate) surfaced as a
    // callable function: graft_might_contain(<serialized bloom literal>,
    // xxhash64(value)). Spark keeps BloomFilterMightContain internal to
    // InjectRuntimeFilter; exposing it lets an operator hand-place the
    // sketch prefilter where the optimizer can't infer it (d18).
    if (!reg.functionExists(FunctionIdentifier("graft_might_contain")))
      reg.createOrReplaceTempFunction("graft_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
  }
}
