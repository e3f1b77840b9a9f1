package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only `count(*)`: a global, unfiltered count over a graft
  * scan is answered from the pinned snapshot's row count — zero data
  * files read, zero tasks — the way Iceberg/Trino serve
  * `SELECT count(*) FROM t` from manifest statistics. On a 100 TB
  * table this is the difference between a catalog lookup and a
  * full-corpus scan for the single most common sanity query an
  * operator runs.
  *
  * Safety bounds (the rewrite fires ONLY when all hold):
  *   - the aggregate is global (no grouping) and EVERY aggregate
  *     expression is `count(1)`/`count(*)` (non-distinct, unfiltered) —
  *     `count(col)` skips nulls and must scan;
  *   - the child is the bare relation, at most under row-preserving
  *     [[Project]]s — any Filter/Limit/Sample keeps the scan;
  *   - the pinned snapshot has NO outstanding merge-on-read delete
  *     files ([[GraftFileIndex.metadataRowCount]] is None otherwise;
  *     `GraftTable.read` on a delete-bearing table plans its delete
  *     anti-joins ABOVE the relation anyway, so the bare-child bound
  *     already refuses those plans — this is belt and braces).
  *
  * Time travel composes: an `asOf`-pinned index serves the pinned
  * snapshot's count. The rewrite preserves the Aggregate's output
  * attributes (ids included), so nothing upstream re-resolves.
  * Installed beside [[GraftStatsRule]] on first graft relation load;
  * [[GraftSparkExtensions]] injects it session-wide too. */
object GraftCountRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _)
        if exprs.nonEmpty && exprs.forall(isCountLiteral) =>
      metadataCountOf(child) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
        case None => agg
      }
  }

  private def isCountLiteral(e: Expression): Boolean = e match {
    case Alias(c, _) => isCountLiteral(c)
    case AggregateExpression(Count(Seq(l: Literal)), Complete, false, None, _) =>
      l.value != null
    case _ => false
  }

  /** The exact row count a bare scan of `p` returns, when that is
    * knowable from metadata alone. */
  private def metadataCountOf(p: LogicalPlan): Option[Long] = p match {
    case Project(_, c) => metadataCountOf(c) // projection preserves rows
    case lr: LogicalRelation =>
      lr.relation match {
        case hfs: HadoopFsRelation =>
          hfs.location match {
            case g: GraftFileIndex => g.metadataRowCount
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** Idempotent installation into the session's extra optimizer rules
    * (the last optimizer batch — the Aggregate is still logical there). */
  def ensureInstalled(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
