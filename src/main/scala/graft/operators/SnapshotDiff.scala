package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based reconciliation between two states of a table — the
  * "what changed between snapshot A and snapshot B" operator behind
  * table audits, CDC backfills, and replication validation. Given two
  * relations with identical schemas and a unique key, classifies every
  * key as ADDED (in `to` only), REMOVED (in `from` only), CHANGED
  * (present in both with different non-key attributes) or UNCHANGED,
  * and returns the four counts plus both cardinalities as one row.
  *
  * The snapshot-level CDC read (`GraftTable.readChanges` — the x11
  * entry) replays the COMMIT LOG between two snapshots; this operator
  * instead diffs the two MATERIALIZED states, which is what you reach
  * for when the log is gone (expired snapshots, a table copied between
  * catalogs, a non-graft source) or when you need net row-level drift,
  * not the intermediate churn (a row updated five times and rolled
  * back is UNCHANGED here and five events there).
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * hash-partition by the same key so the exchange is even for any
  * high-cardinality key, and there is no window, no collect, and no
  * row multiplication (key uniqueness per side is a documented
  * precondition; a duplicate key would fan out the join exactly as it
  * would corrupt any MERGE). Attribute comparison packs the non-key
  * columns into one struct per side BEFORE the join, so the exchange
  * carries each row once and the null-safe struct equality `<=>` runs
  * post-join without re-reading either side. At 100 TB this is the
  * standard reconciliation plan: cost = one co-partitioned join over
  * the union of both states.
  *
  * Reference anchor: the reference validates maintenance effects by
  * re-scanning table states before/after each operation
  * (tests/test_maintenance.py row-count assertions); this is that
  * validation generalized to a first-class relational operator.
  */
object SnapshotDiff {

  /** One-row summary of the key-level diff `from → to`. Both inputs
    * must share a schema; `keys` must be unique within each input. */
  def summary(from: DataFrame, to: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshot diff needs at least one key column")
    require(from.columns.sameElements(to.columns),
      s"schema mismatch: ${from.columns.mkString(",")} vs " +
        to.columns.mkString(","))
    val nonKeys = from.columns.filterNot(keys.contains)
    def pack(df: DataFrame, side: String): DataFrame =
      df.select(keys.map(col) :+
        struct(nonKeys.map(col).toSeq: _*).as(s"_attrs_$side"): _*)
    val f = pack(from, "f")
    val t = pack(to, "t")
    f.join(t, keys, "full_outer")
      .agg(
        count(when(col("_attrs_f").isNull, 1)).as("n_added"),
        count(when(col("_attrs_t").isNull, 1)).as("n_removed"),
        count(when(col("_attrs_f").isNotNull && col("_attrs_t").isNotNull &&
          !(col("_attrs_f") <=> col("_attrs_t")), 1)).as("n_changed"),
        count(when(col("_attrs_f") <=> col("_attrs_t"), 1)).as("n_unchanged"),
        count(col("_attrs_f")).as("n_rows_from"),
        count(col("_attrs_t")).as("n_rows_to"))
  }
}
