package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Metadata-only aggregates: a global, unfiltered `count(*)` /
  * `min(col)` / `max(col)` over a graft scan is answered from snapshot
  * metadata — count from the pinned snapshot's row total (zero I/O,
  * zero tasks), min/max from the manifests' per-file bounds (KB-scale
  * metadata, LocalRelation-backed under the ManifestIO gate) — the way
  * Iceberg/Trino serve these from manifest statistics. On a 100 TB
  * table this is the difference between a catalog lookup and a
  * full-corpus scan for the most common sanity queries an operator
  * runs (`count(*)`, `max(ts)` freshness).
  *
  * Safety bounds (the rewrite fires ONLY when all hold):
  *   - the aggregate is global (no grouping) and EVERY aggregate
  *     expression is `count(1)`/`count(*)` (non-distinct, unfiltered)
  *     or `min`/`max` of a directly-scanned column — `count(col)`
  *     skips nulls and must scan;
  *   - min/max columns are integral, decimal, date, or timestamp —
  *     types whose manifest bound strings round-trip through the SAME
  *     Catalyst cast the file-skipping path already trusts. Float and
  *     double are excluded (footer -0.0 ordering vs Spark's equality
  *     of signed zeros), and strings are excluded (parquet footers may
  *     truncate long binary stats; the inventory's abort contract
  *     covers dropped stats, not truncated ones);
  *   - a file's null bound contributes nothing — by the inventory
  *     contract a null bound means a zero-row file or an all-null
  *     column in that file, both ignorable for min/max (footer stats
  *     that would be WRONG to trust abort to the distributed
  *     inventory, which computes Spark-exact bounds);
  *   - the child is the bare relation, at most under row-preserving
  *     [[Project]]s (attribute renames are followed) — any
  *     Filter/Limit/Sample keeps the scan;
  *   - the pinned snapshot has NO outstanding merge-on-read delete
  *     files (a deleted row may hold the min; with deletes,
  *     [[GraftFileIndex.metadataRowCount]] is None and nothing folds).
  *
  * Time travel composes: an `asOf`-pinned index serves the pinned
  * snapshot's metadata. The rewrite preserves the Aggregate's output
  * attributes (ids, names, types), so nothing upstream re-resolves.
  * Installed beside [[GraftStatsRule]] on first graft relation load;
  * [[GraftSparkExtensions]] injects it session-wide too. */
object GraftCountRule extends Rule[LogicalPlan] {

  private sealed trait FoldSpec
  private case object CountLit extends FoldSpec
  private final case class MinOf(column: String, dt: DataType) extends FoldSpec
  private final case class MaxOf(column: String, dt: DataType) extends FoldSpec

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty =>
      bareScan(child) match {
        case Some((gfi, colMap)) if gfi.metadataRowCount.isDefined =>
          val specs = exprs.map(e => classify(e, colMap))
          if (specs.exists(_.isEmpty)) agg
          else if (specs.forall(_.contains(CountLit))) {
            // pure count: no plan at all — a LocalRelation literal
            val n = gfi.metadataRowCount.get
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
          } else rewriteToManifestAgg(agg, gfi, specs.map(_.get))
        case _ => agg
      }
  }

  /** The equivalent aggregate over the KB-scale manifest relation —
    * LocalRelation-backed under the ManifestIO size gate, a manifest
    * parquet scan above it; either way metadata, never data files.
    * Bounds re-enter through the same `element_at(map, col).cast(dt)`
    * the file-skipping translation trusts. */
  private def rewriteToManifestAgg(agg: Aggregate, gfi: GraftFileIndex,
                                   specs: Seq[FoldSpec]): LogicalPlan = {
    import org.apache.spark.sql.functions._
    val mdf = graft.meta.ManifestIO.relation(gfi.session, gfi.manifestPaths)
    val cols = specs.map {
      case CountLit => coalesce(sum(col("record_count")), lit(0L))
      case MinOf(n, dt) =>
        min(element_at(col("min_values"), lit(n)).cast(dt))
      case MaxOf(n, dt) =>
        max(element_at(col("max_values"), lit(n)).cast(dt))
    }
    val inner = mdf.agg(cols.head, cols.tail: _*).queryExecution.analyzed
    // preserve the original output attributes exactly (id/name/type)
    Project(agg.output.zip(inner.output).map { case (o, i) =>
      Alias(i, o.name)(exprId = o.exprId) }, inner)
  }

  /** Bound-string round-trip allowlist — see the scaladoc rationale. */
  private def foldableMinMax(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private def classify(e: Expression,
                       cols: Map[ExprId, String]): Option[FoldSpec] = e match {
    case Alias(c, _) => classify(c, cols)
    case AggregateExpression(Count(Seq(l: Literal)), Complete, false, None, _)
        if l.value != null => Some(CountLit)
    case AggregateExpression(Min(a: AttributeReference), Complete, false, None, _)
        if cols.contains(a.exprId) && foldableMinMax(a.dataType) =>
      Some(MinOf(cols(a.exprId), a.dataType))
    case AggregateExpression(Max(a: AttributeReference), Complete, false, None, _)
        if cols.contains(a.exprId) && foldableMinMax(a.dataType) =>
      Some(MaxOf(cols(a.exprId), a.dataType))
    case _ => None
  }

  /** The graft index under `p` plus the mapping from `p`'s visible
    * attribute ids to the relation's COLUMN NAMES (renames through
    * row-preserving Projects are followed; computed columns simply
    * don't map, so an aggregate over them refuses the fold). */
  private def bareScan(p: LogicalPlan)
      : Option[(GraftFileIndex, Map[ExprId, String])] = p match {
    case Project(list, c) =>
      bareScan(c).map { case (g, m) =>
        val m2 = list.flatMap {
          case a: AttributeReference =>
            m.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(ar: AttributeReference, _) =>
            m.get(ar.exprId).map(al.exprId -> _)
          case _ => None
        }.toMap
        (g, m2)
      }
    case lr: LogicalRelation =>
      lr.relation match {
        case hfs: HadoopFsRelation =>
          hfs.location match {
            case g: GraftFileIndex =>
              Some((g, lr.output.map(a => a.exprId -> a.name).toMap))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** Idempotent installation into the session's extra optimizer rules
    * (the last optimizer batch — the Aggregate is still logical there). */
  def ensureInstalled(spark: SparkSession): Unit =
    GraftRuleInstall.install(spark, this)
}

/** Serializes extra-optimizer-rule installation: the bare
  * read-modify-write on `spark.experimental.extraOptimizations` is a
  * check-then-act — two concurrent first graft loads (the bench's
  * concurrent warmup) could interleave so that one thread's stale
  * write momentarily DROPPED the other's just-added rule, and a query
  * planned in that window would silently scan where it should fold
  * (x26's plan require() would then fail the gate). One lock per JVM;
  * contains-check inside the lock makes installation exactly-once per
  * (session, rule). */
private[sources] object GraftRuleInstall {
  def install(spark: SparkSession,
              rule: Rule[LogicalPlan]): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(rule))
      spark.experimental.extraOptimizations = cur :+ rule
  }
}
