package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Runtime join file skipping — Iceberg Spark's runtime min/max filter
  * shape. Before joining a huge graft fact table to a (filtered, much
  * smaller) build side, compute the build side's key [min, max] — two
  * scalars from one tiny aggregate — and prune the fact scan's FILES on
  * those bounds through the manifest. Driver cost is two scalars,
  * independent of build-side row count; fact files whose key range
  * cannot match any build row are never opened. At 100 TB this is the
  * difference between scanning the whole fact table and the handful of
  * files the dimension filter actually touches — the run-time analogue
  * of static partition pruning, for keys the writer range-clustered
  * (`sorted_by`, z-order, or partition transforms).
  *
  * Only fact-side-discarding joins are accepted (`inner`, `semi`):
  * pruning fact files under a fact-preserving join (left/full outer)
  * would silently drop unmatched fact rows.
  */
object JoinPrune {

  /** The pruned scan's skip counters ride along for observability. */
  final case class PrunedJoin(df: DataFrame, filesScanned: Long,
                              filesTotal: Long)

  def joinPruned(fact: GraftTable, factKey: String,
                 build: DataFrame, buildKey: String,
                 joinType: String = "inner"): PrunedJoin = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "semi" || jt == "leftsemi",
      s"joinPruned supports inner and semi joins only, got $joinType — " +
        "file pruning under a fact-preserving join would drop rows")
    val mm = build.agg(min(col(buildKey)), max(col(buildKey))).head()
    if (mm.isNullAt(0)) {
      // empty (or all-null-key) build side: the join is empty; scan no files
      val none = fact.read.filter(lit(false))
      val joined =
        if (jt == "inner") none.join(build, none(factKey) === build(buildKey))
        else none.join(build, none(factKey) === build(buildKey), "leftsemi")
      return PrunedJoin(joined, 0L, fact.currentSnapshot.map(_.numFiles)
        .getOrElse(0L))
    }
    val scan = fact.readPruned(factKey, lit(mm.get(0)), lit(mm.get(1)))
    val joined = scan.df.join(build,
      scan.df(factKey) === build(buildKey),
      if (jt == "inner") "inner" else "leftsemi")
    PrunedJoin(joined, scan.filesScanned, scan.filesTotal)
  }
}
