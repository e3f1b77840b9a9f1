package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable
import graft.operators.AsOfJoin

/** File-skipping (manifest min/max bounds) and the as-of join operator. */
class PrunedScanSpec extends SparkSpec {

  test("readPruned skips files outside the bound range, keeps the answer exact") {
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") * 2).as("v"))
    val t = GraftTable.create(spark, tmpDir("pruned") + "/t", df.schema)
    // Range-cluster on id into 8 files → tight per-file min/max bounds.
    t.append(df.repartitionByRange(8, col("id")))

    val scan = t.readPruned("id", lit(100L), lit(199L))
    assert(scan.filesTotal == 8)
    assert(scan.filesScanned < scan.filesTotal,
      s"expected skipping, scanned ${scan.filesScanned}/${scan.filesTotal}")

    val got = scan.df.filter(col("id").between(100, 199))
      .agg(sum("v")).collect()(0).getLong(0)
    val want = df.filter(col("id").between(100, 199))
      .agg(sum("v")).collect()(0).getLong(0)
    assert(got == want)
  }

  test("readPruned never loses rows even when bounds cover everything") {
    val df = spark.range(0, 100).select(col("id"))
    val t = GraftTable.create(spark, tmpDir("pruned_all") + "/t", df.schema)
    t.append(df.repartition(4)) // round-robin: overlapping bounds, no skip
    val scan = t.readPruned("id", lit(0L), lit(99L))
    assert(scan.filesScanned == scan.filesTotal)
    assert(scan.df.count() == 100)
  }

  test("as-of join matches at-or-before semantics, null when no prior row") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 7L, 102L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right, Seq("k"),
        leftTime = "t", rightTime = "t", tie = "rid")
      .select(col("lv"), col("matched_rid"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out("l1") == 100L) // equal timestamp matches (<=)
    assert(out("l2") == 101L) // latest at-or-before wins
    assert(out("l3") == -1L)  // right row is strictly later -> no match
  }

  test("forward as-of join matches at-or-after; earliest next wins") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 9L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 101L), (2L, 7L, 102L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.forward(left, right, Seq("k"),
        leftTime = "t", rightTime = "t", tie = "rid")
      .select(col("lv"), col("matched_rid"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out("l1") == 100L) // equal timestamp matches (>=)
    assert(out("l2") == -1L)  // nothing at or after -> no match
    assert(out("l3") == -1L)  // right row is strictly earlier -> no match
  }
}
