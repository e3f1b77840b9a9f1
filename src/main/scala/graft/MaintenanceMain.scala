package graft

import java.time.Clock

import org.apache.spark.sql.SparkSession

import graft.meta.GraftTable
import graft.sched.{ConfigStore, MaintenanceFailure, Scheduler}

/** The deployable maintenance program — the analogue of the reference's
  * `python -m trino_iceberg_maintenance` entrypoint
  * (trino_iceberg_maintenance/__main__.py:204-207): connect, bootstrap
  * the config table DDL if absent, run one maintenance pass over every
  * configured table, log per-table outcomes fail-soft.
  *
  * Deployment shape: `spark-submit --class graft.MaintenanceMain
  * <jar> <warehouseDir>` (or set GRAFT_WAREHOUSE) on whatever cron the
  * reference's container ran on. Environment, mirroring the reference:
  *
  *   - `MAINTENANCE_TABLE` — config-table name under the warehouse root
  *     (default `iceberg_maintenance_schedule`, __main__.py:15)
  *   - `NUM_WORKERS` — bounded task pool size (default 5, __main__.py:13)
  *
  * The connection envs (TRINO_HOST/USER/PASSWORD…, __main__.py:28-37)
  * have no analogue: this engine is the library, not a remote server —
  * a deliberate non-goal recorded in README.md.
  *
  * Exit code: 0 when the pass ran (even with per-table failures — the
  * reference logs task failures and keeps going, __main__.py:73-80);
  * nonzero only when the harness itself cannot run (no warehouse, config
  * table unreadable).
  */
object MaintenanceMain {

  /** One maintenance pass — the testable core. Bootstraps the config
    * table under `warehouseDir` (CREATE TABLE IF NOT EXISTS), resolves
    * each configured `table_name` to `warehouseDir/table_name`, and runs
    * the scheduler's bounded pool. Returns per-table outcomes, failures
    * wrapped, never thrown. */
  def run(spark: SparkSession, warehouseDir: String,
          env: Map[String, String] = sys.env,
          clock: Clock = Clock.systemUTC())
      : Seq[Either[MaintenanceFailure, String]] = {
    val store = ConfigStore.at(spark, warehouseDir, env).createIfNotExists()
    val workers = env.get("NUM_WORKERS").flatMap(_.toIntOption)
      .getOrElse(Scheduler.DefaultNumWorkers)
    new Scheduler(store,
      name => GraftTable.load(spark, s"$warehouseDir/$name"),
      numWorkers = workers, clock = clock).run()
  }

  def main(args: Array[String]): Unit = {
    val warehouse = args.headOption.orElse(sys.env.get("GRAFT_WAREHOUSE"))
      .getOrElse {
        System.err.println(
          "usage: graft.MaintenanceMain <warehouseDir> (or set GRAFT_WAREHOUSE)")
        sys.exit(2)
      }
    // Under spark-submit the master comes from the submit command; the
    // local fallback makes `java -cp … graft.MaintenanceMain` work too.
    val builder = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
    if (!sys.props.contains("spark.master") && !sys.env.contains("SPARK_MASTER"))
      builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val results =
        try run(spark, warehouse)
        catch { case e: Throwable => // harness failure: config unreadable etc.
          System.err.println(s"[maintenance] harness failure: $e")
          spark.stop()
          sys.exit(1)
        }
      results.foreach {
        case Right(name) => println(s"[maintenance] ok: $name")
        case Left(f) => System.err.println(
          s"[maintenance] task failed (isolated): ${f.config.table_name}: ${f.cause}")
      }
      println(s"[maintenance] pass complete: ${results.count(_.isRight)} ok, " +
        s"${results.count(_.isLeft)} failed")
    } finally spark.stop()
  }
}
