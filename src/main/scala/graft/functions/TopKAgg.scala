package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Single-pass grouped TOP-K: `graft_top_k(score, id, k)` returns the k
  * best `(score, id)` pairs per group, ranked score-descending with
  * ascending-id tie-breaks, as `ARRAY<STRUCT<score: DOUBLE, id: BIGINT>>`.
  *
  * The composable spelling — window `row_number() OVER (PARTITION BY g
  * ORDER BY score DESC)` then `rn <= k` — must SHUFFLE AND SORT every
  * input row by (group, score) before it can discard any: at 100 TB
  * that is a full-data exchange plus a per-partition sort, to keep k
  * rows per group. This aggregate is the (b)-tier extension point from
  * the build rules (custom Catalyst expression): a bounded O(k) buffer
  * per group that combines map-side (partial aggregation), so the
  * shuffle carries k pairs per (mapper, group) instead of the corpus,
  * and nothing is ever globally sorted.
  *
  * Determinism: the comparator is a TOTAL order ((score DESC, id ASC)),
  * so the result is independent of input partitioning and merge order —
  * the property that lets the DuckDB window oracle reproduce it exactly.
  * Null scores/ids are skipped, like every built-in Spark aggregate.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case other => throw new IllegalArgumentException(
      s"graft_top_k: k must be a positive INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  // AbstractDataType (ExpectsInputTypes' vocabulary) is private[sql], so
  // input typing is enforced here instead of via ImplicitCastInputTypes —
  // callers cast explicitly. k's VALUE is validated here too: a zero/
  // negative/NULL k must fail analysis, not every task mid-job.
  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k: score must be DOUBLE, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_top_k: id must be BIGINT, got ${id.dataType.simpleString}")
    else kExpr match {
      case Literal(v: Int, IntegerType) if v > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_top_k: k must be a positive INT literal")
    }
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  /** total order: true iff a ranks strictly ahead of b.
    * java.lang.Double.compare — not the primitive operators — so NaN is
    * totally ordered (greatest, like Spark's own double ordering in a
    * window ORDER BY ... DESC) instead of comparing false both ways and
    * making the result partitioning-dependent. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  /** keep the buffer bounded: amortized — entries accumulate to ~2k
    * before each O(n log n) compaction back to k. */
  private def trim(buf: mutable.ArrayBuffer[(Double, Long)],
                   force: Boolean): Unit =
    if (buf.length > (if (force) k else 2 * k + 16)) {
      val best = buf.sortWith(better).take(k)
      buf.clear()
      buf ++= best
    }

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
                      input: InternalRow): mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      trim(buf, force = false)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Double, Long)],
                     other: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] = {
    buf ++= other
    trim(buf, force = false)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any = {
    trim(buf, force = true)
    new GenericArrayData(buf.sortWith(better)
      .map(t => InternalRow(t._1, t._2)).toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)]): Array[Byte] = {
    trim(buf, force = true) // ship at most k pairs per (mapper, group)
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var j = 0
    while (j < n) { buf += ((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
