package graft.sched

import java.time.Clock
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import graft.meta.GraftTable
import graft.sql.GraftSql

/** A failed maintenance run for one table, carrying its config — the
  * analogue of MaintenanceTaskException (__main__.py:102-109). */
final case class MaintenanceFailure(config: MaintenanceConfig, cause: Throwable)
  extends RuntimeException(
    s"maintenance failed for table ${config.table_name}", cause)

/** The maintenance scheduler — full parity with the reference's
  * `run_maintenance` + `MaintenanceTask.execute`
  * (trino_iceberg_maintenance/__main__.py:60-201):
  *
  *   - scan the config table, one task per row (:62-71)
  *   - bounded thread pool of `numWorkers` (default 5, :13,65); the
  *     shared SparkSession is thread-safe, so concurrent tasks become
  *     concurrent Spark jobs
  *   - per table, strictly in order: remove_orphan_files →
  *     expire_snapshots → optimize → analyze (:141-199)
  *   - optimize/analyze run only when never stamped or
  *     `last + days <= now` (:161-167,180-186); after running, the
  *     config row is stamped under the store's lock (:171-176,193-198)
  *   - per-task error isolation: one table's failure aborts ITS
  *     remaining steps but never the batch (:73-80,200-201)
  *
  * One deliberate deviation (SURVEY.md §7.7c): the reference gates on
  * the client clock but stamps with the server clock (two clocks,
  * __main__.py:165 vs :174); we use the single injected [[Clock]] for
  * both — which is also what makes the freezegun-style day-jump tests
  * expressible.
  */
final class Scheduler(
    store: ConfigStore,
    resolveTable: String => GraftTable,
    numWorkers: Int = Scheduler.DefaultNumWorkers,
    clock: Clock = Clock.systemUTC()) {

  private val dayMs = 86400000L

  /** `not last or last + timedelta(days) <= now` (__main__.py:165,184). */
  private def due(last: Option[java.sql.Timestamp], days: Option[Int]): Boolean =
    last match {
      case None => true
      case Some(ts) => days.exists(d => ts.getTime + d * dayMs <= clock.millis())
    }

  /** Resolve the config table by ITS name too, so the stamp UPDATEs can
    * address it the way the reference does (`UPDATE {MAINTENANCE_TABLE}`,
    * __main__.py:172,194). */
  private val resolver: String => GraftTable = {
    case n if n == store.tableName => store.table
    case n => resolveTable(n)
  }

  /** Quoted identifier — configured table names are data, not trusted
    * SQL text; unquoted interpolation broke on hyphens/spaces. */
  private def qid(name: String): String = "\"" + name + "\""

  /** Single-quoted string literal with '' escaping. */
  private def qlit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** One table's pipeline (MaintenanceTask.execute, __main__.py:121-201).
    * Each step issues the reference's exact SQL statement through
    * [[GraftSql]] — SQL is the engine's maintenance interface, the Scala
    * methods on [[GraftTable]] are what the statements dispatch to. */
  private[graft] def executeTask(cfg: MaintenanceConfig): Unit = {
    val spark = resolveTable(cfg.table_name).spark
    def sql(s: String): Unit = { GraftSql.exec(spark, s, resolver, clock); () }
    val t = qid(cfg.table_name)
    // __main__.py:144-147
    if (cfg.orphanEnabled)
      cfg.retention_days_orphan_files.foreach(d => sql(
        s"""ALTER TABLE $t EXECUTE remove_orphan_files(
           |    retention_threshold => '${d}d'
           |)""".stripMargin))
    // __main__.py:154-157
    if (cfg.expireEnabled)
      cfg.retention_days_snapshots.foreach(d => sql(
        s"""ALTER TABLE $t EXECUTE expire_snapshots(
           |    retention_threshold => '${d}d'
           |)""".stripMargin))
    // __main__.py:170-176
    if (cfg.optimizeEnabled && due(cfg.last_optimized_on, cfg.days_to_optimize)) {
      sql(s"ALTER TABLE $t EXECUTE optimize")
      sql(s"""UPDATE ${qid(store.tableName)}
             |SET last_optimized_on = current_timestamp(6)
             |WHERE table_name = ${qlit(cfg.table_name)}""".stripMargin)
    }
    // __main__.py:180-199
    if (cfg.analyzeEnabled && due(cfg.last_analyzed_on, cfg.days_to_analyze)) {
      val withColumns = cfg.columns_to_analyze match {
        case Some(cs) if cs.nonEmpty =>
          s"\nWITH (columns = ARRAY[${cs.map(c => s"'${c.replace("'", "''")}'").mkString(", ")}])"
        case _ => ""
      }
      sql(s"ANALYZE $t$withColumns")
      sql(s"""UPDATE ${qid(store.tableName)}
             |SET last_analyzed_on = current_timestamp(6)
             |WHERE table_name = ${qlit(cfg.table_name)}""".stripMargin)
    }
  }

  /** Run maintenance for every configured table; returns per-table
    * results, failures wrapped — never thrown (fail-soft batch). */
  def run(): Seq[Either[MaintenanceFailure, String]] = {
    val configs = store.load()
    if (configs.isEmpty) return Seq.empty
    val pool = Executors.newFixedThreadPool(math.min(numWorkers, configs.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = configs.map { cfg =>
        Future(Try(executeTask(cfg)) match {
          case Success(_) => Right(cfg.table_name)
          case Failure(e) => Left(MaintenanceFailure(cfg, e))
        })
      }
      Await.result(Future.sequence(futures), Duration.Inf)
    } finally pool.shutdown()
  }
}

object Scheduler {
  /** NUM_WORKERS default (__main__.py:13, env-overridable per README:35-38). */
  val DefaultNumWorkers: Int =
    sys.env.get("NUM_WORKERS").flatMap(_.toIntOption).getOrElse(5)
}
