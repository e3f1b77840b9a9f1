package graft

import java.time.Clock

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.cmd.Analyze
import graft.meta.GraftTable

/** ANALYZE → Catalyst CBO wiring (GraftStatsRule): the reason the
  * reference runs ANALYZE is that Trino's cost-based optimizer consumes
  * the Iceberg NDV/null-fraction stats for join decisions
  * (docker/trino/catalog/iceberg.properties:10). This spec pins the
  * Spark analogue end-to-end: with AQE off, a join whose raw byte sizes
  * forbid broadcasting flips to a broadcast join once ANALYZE stats let
  * filter estimation see that a selective predicate leaves a tiny side.
  */
class CboStatsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joins(df: DataFrame): (Int, Int) = {
    val plan = df.queryExecution.executedPlan
    (collectWithSubqueries(plan) { case j: SortMergeJoinExec => j }.size,
      collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }.size)
  }

  test("analyzed stats flip a sort-merge join to broadcast under CBO") {
    import spark.implicits._
    val dir = tmpDir("cbostats")
    // varied pads defeat parquet compression so the RAW byte sizes of
    // both sides genuinely exceed the broadcast threshold
    def pad(i: Int): String =
      java.lang.Long.toHexString((i.toLong + 7) * 0x9E3779B97F4A7C15L) * 4
    val tDf = (0 until 20000).map(i =>
      (i.toLong, (i % 50).toLong, pad(i))).toDF("k", "j", "pad")
    val t = GraftTable.create(spark, s"$dir/t", tDf.schema)
    t.append(tDf)
    val uDf = (0 until 5000).map(i =>
      (i.toLong % 50, pad(i + 1000000))).toDF("j", "v")
    val u = GraftTable.create(spark, s"$dir/u", uDf.schema)
    u.append(uDf)

    def q: DataFrame = spark.read.format("graft").load(s"$dir/t")
      .filter($"k" === 5L)
      .join(spark.read.format("graft").load(s"$dir/u"), "j")

    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "32768") {

      // both raw scans exceed the threshold and CBO is off → the
      // selective filter cannot shrink the estimate → sort-merge join
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val (smj0, bhj0) = joins(q)
      assert(smj0 == 1 && bhj0 == 0,
        s"expected a sort-merge join without stats, got smj=$smj0 bhj=$bhj0")

      // ANALYZE pins NDV(k) ≈ 20000; CBO's equality estimation then
      // puts the filtered side at ~1 row → broadcast
      Analyze.run(t, None, Clock.systemUTC())
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val (smj1, bhj1) = joins(q)
      assert(bhj1 == 1 && smj1 == 0,
        s"expected a broadcast join with ANALYZE stats + CBO, got " +
          s"smj=$smj1 bhj=$bhj1")

      // row count flows even without a filter: the logical stats of the
      // bare scan carry the snapshot's row count and the column NDVs
      val scan = spark.read.format("graft").load(s"$dir/t")
      val stats = scan.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(20000)))
      val ndvs = stats.attributeStats.map { case (a, st) =>
        a.name -> st.distinctCount }.toMap
      assert(ndvs.get("j").flatten.exists(n => n >= 40 && n <= 60),
        s"NDV(j) should be ~50, got ${ndvs.get("j")}")
      spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }
}
