package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for every left row, attach the single most
  * recent right row with the same key whose time is `<=` the left row's
  * time (the point-in-time lookup of market-data joins, feature
  * backfills, and slowly-changing-dimension reads).
  *
  * Spark has no built-in as-of join, and the naive formulations do not
  * survive scale: a range-join (`l.key = r.key AND r.ts <= l.ts` +
  * per-row max) explodes to O(|matches|) intermediate rows, and a
  * per-left-row subquery is a correlated re-scan. This operator instead
  * uses the UNION + WINDOW "merge" composition (build-rule tier (a) —
  * existing operators express the semantics exactly):
  *
  *   1. tag both inputs and union them — a zero-shuffle narrow op;
  *   2. one window `partitionBy(key) orderBy(time, side, tie)` carries
  *      the latest right payload forward via `last(_, ignoreNulls)`;
  *   3. keep the left rows, now holding their as-of match.
  *
  * Cost at any scale: exactly ONE shuffle (the window's partitioning on
  * key), no join, no row multiplication — the same single-sort profile a
  * hand-written merge-join would have. Right rows sort BEFORE left rows
  * at equal timestamps, so a right row at exactly t matches a left row
  * at t (`<=`, matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
  *
  * The caller must ensure at most one right row per (key, time, tie)
  * triple — with ties, `tie` decides which row wins (ascending order,
  * last wins), and the DuckDB oracle's ASOF would be free to pick either.
  */
object AsOfJoin {
  /** @param key      equi-join key columns (must exist on both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param tie       right-side tiebreak column for equal timestamps
    *                  (largest value wins, mirroring "latest version")
    * @return left columns unchanged + each right non-key column as
    *         `matched_<name>` (null when no right row is at or before)
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTime: String, rightTime: String, tie: String): DataFrame =
    merge(left, right, key, leftTime, rightTime, tie, forwardDir = false)

  /** Forward as-of join: for every left row, the EARLIEST right row with
    * the same key whose time is `>=` the left row's time — the
    * "next-version" lookup (e.g. first purchase after a click). Same
    * one-shuffle union+window composition as [[backward]], with the
    * window frame looking forward; a right row at exactly t matches a
    * left row at t (`>=`, matching DuckDB's `ASOF JOIN ... ON
    * l.ts <= r.ts`). With ties, the smallest `tie` wins. */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
              leftTime: String, rightTime: String, tie: String): DataFrame =
    merge(left, right, key, leftTime, rightTime, tie, forwardDir = true)

  private def merge(left: DataFrame, right: DataFrame, key: Seq[String],
                    leftTime: String, rightTime: String, tie: String,
                    forwardDir: Boolean): DataFrame = {
    val payloadCols = right.columns.filterNot(key.contains).toSeq
    val payloadType = StructType(
      payloadCols.map(c => right.schema(c)))
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rPayload = struct(payloadCols.map(col): _*)

    // side ordering puts the right rows INSIDE the left row's frame at
    // equal timestamps: backward frames end at the left row (right
    // sorts first), forward frames start at it (right sorts last)
    val (lSide, rSide) = if (forwardDir) (0, 1) else (1, 0)
    val tagged = left.select(
      key.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(lSide).as("__side"),
        lit(null).cast(right.schema(tie).dataType).as("__tie"),
        lStruct.as("__l"),
        lit(null).cast(payloadType).as("__r")): _*)
      .unionByName(right.select(
        key.map(col) ++ Seq(
          col(rightTime).as("__t"), lit(rSide).as("__side"),
          col(tie).as("__tie"),
          lit(null).cast(left.schema).as("__l"),
          rPayload.as("__r")): _*))

    val ordered = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
    val matched =
      if (forwardDir) tagged.withColumn("__m",
        first(col("__r"), ignoreNulls = true).over(
          ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else tagged.withColumn("__m",
        last(col("__r"), ignoreNulls = true).over(
          ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val out: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(s"matched_$c"))
    matched.filter(col("__side") === lSide).select(out: _*)
  }
}
