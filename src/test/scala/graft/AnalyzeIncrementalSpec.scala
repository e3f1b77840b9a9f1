package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** Incremental ANALYZE: only uncovered files are scanned, and merged
  * sketch stats agree with a full recompute. */
class AnalyzeIncrementalSpec extends SparkSpec {

  private val ab = StructType(Seq(
    StructField("a", StringType), StructField("b", StringType)))

  private def append(t: GraftTable, clock: TestClock, vals: (String, String)*): Unit =
    t.append(spark.createDataFrame(
      vals.map { case (x, y) => Row(x, y) }.asJava, ab), clock)

  test("second run scans only newly appended files; stats merge correctly") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("inc") + "/t", ab)
    append(t, clock, ("x", null), ("y", null))
    val firstScan = t.analyzeIncremental(clock)
    assert(firstScan >= 1)

    val s1 = t.statsIncremental.collect()
    assert(s1(0).getDouble(3) == 0.0) // a: no nulls
    assert(s1(1).getDouble(3) == 1.0) // b: all null
    assert(s1(0).getDouble(2) == 2.0) // ndv(a) = 2
    assert(s1(0).getString(5) == "x" && s1(0).getString(6) == "y")

    // append more data: ONLY the new files get scanned
    append(t, clock, ("x", "q"))
    val before = t.files.count()
    val secondScan = t.analyzeIncremental(clock)
    assert(secondScan == 1) // exactly the one new file
    assert(t.analyzeIncremental(clock) == 0) // idempotent when covered

    val s2 = t.statsIncremental.collect()
    assert(s2(0).getDouble(3) == 0.0)
    assert(s2(1).getDouble(3) == 2.0 / 3.0) // b: 2 of 3 null, merged
    assert(s2(0).getDouble(2) == 2.0) // ndv(a) still {x, y}
    assert(s2(2).getDouble(4) == 3.0) // summary row_count
    assert(before == t.files.count())
  }

  test("after optimize, only the rewritten files are re-sketched") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("incopt") + "/t", ab)
    append(t, clock, ("x", "1"))
    append(t, clock, ("y", "2"))
    t.analyzeIncremental(clock)
    t.optimize(clock = clock)
    assert(t.files.count() == 1)
    val rescanned = t.analyzeIncremental(clock)
    assert(rescanned == 1) // the single compacted output file
    val s = t.statsIncremental.collect()
    assert(s(0).getDouble(3) == 0.0)
    assert(s(0).getDouble(2) == 2.0) // ndv survives the rewrite
    assert(s(0).getString(5) == "x" && s(0).getString(6) == "y")
  }

  test("KLL quantiles merge across incremental sketch batches") {
    import org.apache.spark.sql.functions._
    val clock = new TestClock
    val df0 = spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, tmpDir("inc") + "/t", df0.schema)
    t.append(df0.filter(col("k") < 500), clock)
    t.analyzeIncremental(clock)
    t.append(df0.filter(col("k") >= 500), clock) // second sketch batch
    t.analyzeIncremental(clock)
    val q = t.quantilesIncremental(Seq(0.25, 0.5, 0.75))
      .filter(col("column_name") === "v").collect().head
    // KLL default rank error ~1.7%: accept +-3% of the 0..999 range
    def close(got: Double, exact: Double) = math.abs(got - exact) <= 30.0
    assert(close(q.getDouble(1), 249.75), s"p25 ${q.getDouble(1)}")
    assert(close(q.getDouble(2), 499.5), s"p50 ${q.getDouble(2)}")
    assert(close(q.getDouble(3), 749.25), s"p75 ${q.getDouble(3)}")
  }

  test("numeric min/max merge numerically, not lexicographically") {
    val num = StructType(Seq(StructField("v", LongType)))
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("incnum") + "/t", num)
    t.append(spark.createDataFrame(Seq(Row(9L)).asJava, num), clock)
    t.append(spark.createDataFrame(Seq(Row(10L)).asJava, num), clock)
    t.analyzeIncremental(clock)
    val s = t.statsIncremental.collect()
    assert(s(0).getString(5) == "9")  // lexical min would be "10"
    assert(s(0).getString(6) == "10") // lexical max would be "9"
  }
}
