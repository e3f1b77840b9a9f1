package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** `graft_pairs(ds)` — generator emitting every index pair (i < j) of
  * an ARRAY<STRUCT<...>> column as two struct columns `(x, y)` — the
  * bucket-local pair expansion of [[graft.ext.DedupQueries.
  * saltedPairExpansion]] as ONE generator call per bucket row instead
  * of the nested `flatten(transform(ds, x -> filter(transform(ds,
  * y -> named_struct(...)), pred)))` composable form, which evaluates
  * four interpreted lambdas per candidate ORDERED pair and materializes
  * the full n² struct array per bucket before the explode (r18,
  * guide §4). Orientation by member id and the residual predicates
  * move to ordinary Catalyst `Filter`/`Project` nodes over the emitted
  * rows — whole-stage-codegen-able, unlike lambda bodies — with the
  * pair SET unchanged: index pairs i<j cover each unordered pair
  * exactly once, and the downstream id-orientation (strict `<`, null
  * when equal) reproduces the fold's "emit once, oriented by id, drop
  * id-ties" semantics verbatim (pinned by PairExpandSpec against the
  * literal composable form).
  *
  * A null or < 2-element array emits nothing, exactly like the fold
  * (no pairs exist). Eval-mode generator (CodegenFallback): one
  * virtual call per bucket ROW — the per-element interpreted dispatch
  * is what this removes; GenerateExec's copy discipline makes the
  * shared holder row safe (each emitted row is projected before the
  * next `next()`).
  */
case class PairExpand(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pairs requires ARRAY<STRUCT<...>>, got ${other.simpleString}")
  }

  private def elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def elementSchema: StructType = StructType(Seq(
    StructField("x", elemType, nullable = true),
    StructField("y", elemType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Nil
    val arr = data.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val fields = elemType.length
    // materialize the element views once (getStruct allocates a fresh
    // view per call; holding them across the iteration is safe)
    val elems = new Array[InternalRow](n)
    var k = 0
    while (k < n) {
      elems(k) = if (arr.isNullAt(k)) null else arr.getStruct(k, fields)
      k += 1
    }
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private val holder = new GenericInternalRow(2)
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        holder.update(0, elems(i))
        holder.update(1, elems(j))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        holder
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
