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

  test("ANALYZE-driven NDV reorders a 3-table join under CBO join reorder") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import spark.implicits._
    val dir = tmpDir("cboreorder")
    def pad(i: Int): String =
      java.lang.Long.toHexString((i.toLong + 3) * 0x9E3779B97F4A7C15L) * 2
    // fact: every row matches d1 (non-reducing); only w=3 rows match the
    // FILTERED d2 (highly reducing) — the cheap plan joins d2 FIRST
    val fDf = (0 until 40000).map(i =>
      (i.toLong % 2000, i.toLong % 4000, pad(i))).toDF("k1", "k2", "padf")
    val f = GraftTable.create(spark, s"$dir/f", fDf.schema)
    f.append(fDf)
    val d1Df = (0 until 2000).map(i => (i.toLong, pad(i + 500000)))
      .toDF("k1", "v1")
    val d1 = GraftTable.create(spark, s"$dir/d1", d1Df.schema)
    d1.append(d1Df)
    val d2Df = (0 until 4000).map(i => (i.toLong, i.toLong % 1000, pad(i + 900000)))
      .toDF("k2", "w", "v2")
    val d2 = GraftTable.create(spark, s"$dir/d2", d2Df.schema)
    d2.append(d2Df)
    Seq(f, d1, d2).foreach(t => Analyze.run(t, None, Clock.systemUTC()))

    def scan(n: String) = spark.read.format("graft").load(s"$dir/$n")
    // written in the EXPENSIVE order: the non-reducing d1 join first
    def q = scan("f")
      .join(scan("d1"), "k1")
      .join(scan("d2").filter($"w" === 3L), "k2")
      .groupBy($"w").agg(count(lit(1)).as("n"))
    def innermostJoinKeys(df: DataFrame): Set[String] = {
      val all = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      all.filter(j => j.children.forall(
          c => c.collect { case jj: LJoin => jj }.isEmpty))
        .flatMap(_.condition).flatMap(_.references.map(_.name)).toSet
    }

    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      // withStats attaches the ANALYZE stats at RESOLUTION time, ahead
      // of the CostBasedJoinReorder batch (ensureInstalled's slot runs
      // after it); the reorder then joins the selective d2 side first
      val reordered = graft.sources.GraftStatsRule.withStats(q)
      assert(innermostJoinKeys(reordered).contains("k2"),
        s"expected d2 joined first, innermost keys: ${innermostJoinKeys(reordered)}")
      // the written order stands when stats arrive too late for reorder
      assert(innermostJoinKeys(q).contains("k1"),
        s"expected written order without resolution-time stats")
      // same rows either way — reorder must not change semantics
      val a = reordered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b && a.nonEmpty)
    }
  }
}
