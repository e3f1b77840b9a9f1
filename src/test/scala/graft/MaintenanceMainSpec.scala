package graft

import graft.meta.GraftTable
import graft.sched.{ConfigStore, MaintenanceConfig}

/** End-to-end drive of the deployable entrypoint over a temp warehouse —
  * the repo analogue of running `python -m trino_iceberg_maintenance`
  * against a live catalog (__main__.py:204-207): bootstrap DDL, full
  * pass, stamps, day gate, per-table failure isolation. */
class MaintenanceMainSpec extends SparkSpec {

  private def cfg(name: String): MaintenanceConfig =
    MaintenanceConfig(name,
      should_analyze = Some(1), last_analyzed_on = None,
      days_to_analyze = Some(10), columns_to_analyze = None,
      should_optimize = Some(1), last_optimized_on = None,
      days_to_optimize = Some(10),
      should_expire_snapshots = None, retention_days_snapshots = None,
      should_remove_orphan_files = None, retention_days_orphan_files = None)

  test("run() bootstraps the config table and no-ops on an empty warehouse") {
    val wh = tmpDir("graft_mainwh0")
    val env = Map("MAINTENANCE_TABLE" -> "sched_cfg")
    assert(MaintenanceMain.run(spark, wh, env, new TestClock()).isEmpty)
    assert(GraftTable.exists(spark, s"$wh/sched_cfg"))
  }

  test("run() maintains configured tables, stamps, gates, isolates failures") {
    val wh = tmpDir("graft_mainwh")
    val clock = new TestClock()
    val env = Map("MAINTENANCE_TABLE" -> "sched_cfg", "NUM_WORKERS" -> "2")
    // seed one healthy two-file table and one config row pointing nowhere
    val df = spark.range(200).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    val t = GraftTable.create(spark, s"$wh/alpha", df.schema)
    t.append(df.repartition(2), clock)
    ConfigStore.at(spark, wh, env).createIfNotExists()
      .insert(cfg("alpha"), cfg("ghost"))

    val results = MaintenanceMain.run(spark, wh, env, clock)
    assert(results.size == 2)
    assert(results.collect { case Right(n) => n } == Seq("alpha"))
    assert(results.collect { case Left(f) => f.config.table_name } == Seq("ghost"))

    // alpha was compacted (2 files -> 1), analyzed, and both stamps landed
    val alpha = GraftTable.load(spark, s"$wh/alpha")
    assert(alpha.currentSnapshot.get.numFiles == 1L)
    assert(alpha.read.count() == 200L)
    val row = ConfigStore.at(spark, wh, env).load()
      .find(_.table_name == "alpha").get
    assert(row.last_optimized_on.nonEmpty && row.last_analyzed_on.nonEmpty)

    // a second pass inside the day gate commits nothing new on alpha
    val head = alpha.currentSnapshot.get.snapshotId
    MaintenanceMain.run(spark, wh, env, clock)
    assert(GraftTable.load(spark, s"$wh/alpha")
      .currentSnapshot.get.snapshotId == head)

    // past the gate, the pass runs again and re-stamps
    clock.advanceDays(11)
    MaintenanceMain.run(spark, wh, env, clock)
    val restamped = ConfigStore.at(spark, wh, env).load()
      .find(_.table_name == "alpha").get
    assert(restamped.last_optimized_on.get.after(row.last_optimized_on.get))
  }
}
