package graft.sched

import java.nio.file.Files
import java.time.{Clock, Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Driver-visible demos of the maintenance surface (SURVEY.md §2.1 ops
  * #4-#9, #13-#14, #16-#19). Maintenance commands aren't SQL-expressible
  * in DuckDB, so these carry no oracle — the driver records the weaker
  * rows>0 check (builder contract) — while the exact behavioral
  * contracts are pinned by ScalaTest (MaintenanceSpec mirrors
  * tests/test_maintenance.py:41-169).
  *
  * Each demo seeds a throwaway GraftTable under java.io.tmpdir from the
  * REAL sf testdata, runs the command(s), and returns a DataFrame
  * summarizing observable state.
  */
object MaintenanceQueries {
  private def fixedClock(epochDay: Long): Clock =
    Clock.fixed(Instant.ofEpochSecond(epochDay * 86400), ZoneOffset.UTC)

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_$tag").resolve("t").toString

  private def seed(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")

  /** optimize: two appended file sets compact to ceil(bytes/target). */
  private def optimizeDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("optimize"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    t.append(df.filter(col("p_partkey") % 2 === 0).repartition(4), t0)
    t.append(df.filter(col("p_partkey") % 2 === 1).repartition(4), t0)
    val before = t.currentSnapshot.map(_.numFiles).getOrElse(0L)
    t.optimize(clock = t0)
    t.files.select(lit(before).as("files_before"), col("path"),
      col("size_bytes"), col("record_count"), col("added_snapshot_id"))
  }

  /** expire_snapshots: files exclusive to expired snapshots reclaimed. */
  private def expireDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t1 = fixedClock(20011) // +11 days
    val t = GraftTable.create(spark, freshDir("expire"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    t.append(df.limit(100), t0)
    t.append(df.limit(100), t0)
    t.optimize(clock = t0)
    t.append(df.limit(50), t1)
    val deleted = t.expireSnapshots(retentionDays = 5, clock = t1)
    import spark.implicits._
    t.snapshots.toDF()
      .select(col("snapshotId"), col("operation"), col("numFiles"),
        col("totalRows"), lit(deleted).as("files_deleted"))
  }

  /** remove_orphan_files: unreferenced + old ⇒ deleted; live kept. */
  private def orphanDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t1 = fixedClock(20011)
    val loc = freshDir("orphan")
    val t = GraftTable.create(spark, loc, seed(spark, sfDir).schema)
    t.append(seed(spark, sfDir).limit(100), t0)
    // a stray uncommitted write — e.g. a failed job's leftovers
    seed(spark, sfDir).limit(10).write.mode("overwrite")
      .parquet(s"$loc/data/stray")
    val before = GraftTable.listFiles(t.fileSystem,
      new org.apache.hadoop.fs.Path(loc, "data")).size
    val deleted = t.removeOrphanFiles(retentionDays = 5, clock = t1)
    t.files.select(lit(before).as("files_on_disk_before"),
      lit(deleted).as("orphans_deleted"), col("path"), col("record_count"))
  }

  /** ANALYZE + SHOW STATS: exact null fractions, HLL NDV, min/max. */
  private def analyzeDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("analyze"),
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("lang_or_null",
          when(col("lang") === "en", lit(null)).otherwise(col("lang")))
        .schema)
    t.append(spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("lang_or_null",
        when(col("lang") === "en", lit(null)).otherwise(col("lang"))), t0)
    t.analyze(clock = t0)
    t.stats
  }

  /** Full scheduler pass: config table, gates, stamps, fail-soft pool. */
  private def schedulerDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val base = Files.createTempDirectory("graft_sched")
    val store = new ConfigStore(spark, base.resolve("cfg").toString)
      .createIfNotExists()
    // expire/orphan run in their own demos (x02/x03); the scheduler demo
    // exercises gates + stamps + the bounded pool with optimize/analyze.
    // alpha stages TWO FILES IN ONE COMMIT (repartition(2)) so optimize
    // visibly compacts without paying a second commit; beta one file.
    // Both config rows go in a single INSERT — one commit, not two.
    // the two tables are independent — seed them concurrently, exactly
    // like the bounded worker pool the scheduler itself runs with
    val seedThreads = Seq("alpha", "beta").map { n =>
      new Thread(() => {
        val t = GraftTable.create(spark, base.resolve(n).toString,
          seed(spark, sfDir).schema)
        if (n == "alpha")
          t.append(seed(spark, sfDir).limit(160).repartition(2), t0)
        else t.append(seed(spark, sfDir).limit(80), t0)
      })
    }
    seedThreads.foreach(_.start())
    seedThreads.foreach(_.join())
    store.insert(Seq("alpha", "beta").map { n =>
      MaintenanceConfig(n,
        should_analyze = if (n == "alpha") Some(1) else None,
        last_analyzed_on = None, days_to_analyze = Some(10),
        columns_to_analyze = Some(Seq("p_name", "p_retailprice")),
        should_optimize = Some(1), last_optimized_on = None,
        days_to_optimize = Some(10),
        should_expire_snapshots = None, retention_days_snapshots = None,
        should_remove_orphan_files = None, retention_days_orphan_files = None)
    }: _*)
    val sched = new Scheduler(store,
      n => GraftTable.load(spark, base.resolve(n).toString),
      numWorkers = 2, clock = t0)
    val results = sched.run()
    require(results.forall(_.isRight), "scheduler demo: a task failed")
    store.dataset().toDF()
      .select(col("table_name"), col("should_optimize"),
        col("last_optimized_on").cast("string").as("last_optimized_on"),
        col("last_analyzed_on").cast("string").as("last_analyzed_on"))
      .orderBy("table_name")
  }

  /** Incremental ANALYZE: append → sketch → append → sketch scans only
    * the new files; merged HLL/min-max stats over the sketch store. */
  private def incrementalDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("inc"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    t.append(df.filter(col("p_partkey") % 2 === 0), t0)
    val scan1 = t.analyzeIncremental(t0)
    t.append(df.filter(col("p_partkey") % 2 === 1), t0)
    val scan2 = t.analyzeIncremental(t0)
    t.statsIncremental
      .select(lit(scan1).as("files_scanned_run1"),
        lit(scan2).as("files_scanned_run2"), col("column_name"),
        col("distinct_values_count"), col("nulls_fraction"), col("row_count"))
  }

  /** rewrite_manifests: three delta-manifest appends merge to one
    * manifest; same files, same rows, lineage preserved. */
  private def rewriteManifestsDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("rewrite"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    (0 until 3).foreach(i =>
      t.append(df.filter(col("p_partkey") % 3 === i), t0))
    val before = t.currentSnapshot.map(_.manifests.size).getOrElse(0)
    val rowsBefore = t.currentSnapshot.map(_.totalRows).getOrElse(0L)
    val merged = t.rewriteManifests(t0)
    val after = t.currentSnapshot.map(_.manifests.size).getOrElse(0)
    t.files
      .select(lit(before).as("manifests_before"),
        lit(merged).as("manifests_merged"),
        lit(after).as("manifests_after"),
        lit(rowsBefore).as("rows_before"), col("path"),
        col("record_count"), col("added_snapshot_id"))
  }

  /** Write-audit-publish on branch refs: stage appends on an audit
    * branch (main isolated), validate, publish with one atomic
    * fast-forward ref move; branch heads are pinned against expiry. */
  private def wapDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("wap"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    t.append(df.filter(col("p_partkey") % 2 === 0), t0)
    val mainBefore = t.read.count()
    t.createBranch("audit")
    t.appendToBranch("audit", df.filter(col("p_partkey") % 2 === 1), t0)
    val stagedRows = t.readBranch("audit").count()
    val mainDuringAudit = t.read.count()
    // audit: staged batch must not shrink the table and must dedupe keys
    require(stagedRows > mainDuringAudit, "audit failed: nothing staged")
    t.fastForward("main", "audit")
    import spark.implicits._
    t.branches.toSeq.toDF("branch", "head_snapshot_id")
      .withColumn("rows_main_before", lit(mainBefore))
      .withColumn("rows_main_during_audit", lit(mainDuringAudit))
      .withColumn("rows_staged", lit(stagedRows))
      .withColumn("rows_main_published", lit(t.read.count()))
      .orderBy("branch")
  }

  /** Incremental append scan + rollback: the checkpoint-consumer reads
    * only what arrived since its last snapshot; rollback is one atomic
    * ref move with later snapshots still readable by id. */
  private def incrementalReadDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("increread"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    t.append(df.filter(col("p_partkey") % 3 === 0), t0) // snapshot 1
    t.append(df.filter(col("p_partkey") % 3 === 1), t0) // snapshot 2
    t.append(df.filter(col("p_partkey") % 3 === 2), t0) // snapshot 3
    val sinceCheckpoint = t.readIncremental(1L, 3L).count()
    val full = t.rowCount
    t.rollback(2L)
    val afterRollback = t.rowCount
    import spark.implicits._
    Seq((sinceCheckpoint, full, afterRollback,
      t.readAsOf(3L).count(), t.branches("main")))
      .toDF("rows_added_since_snapshot1", "rows_at_snapshot3",
        "rows_after_rollback_to_2", "rows_snapshot3_by_id", "main_head")
  }

  /** Merge-on-read position deletes: a delete writes a small
    * (file_path, pos) file instead of rewriting data; reads anti-join
    * it away; optimize materializes it and drops the delete manifests. */
  private def morDeleteDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("mor"),
      seed(spark, sfDir).schema)
    t.append(seed(spark, sfDir).repartition(3), t0)
    // file counts from the snapshot summary — metadata-only, no scan
    def nFiles = t.currentSnapshot.map(_.numFiles).getOrElse(0L)
    val filesBefore = nFiles
    val rowsBefore = t.rowCount
    val deleted = t.deleteWhereMOR(col("p_partkey") % 7 === 0, t0) +
      t.deleteWhereMOR(col("p_partkey") % 11 === 1, t0)
    val filesAfterDelete = nFiles // unchanged: metadata-only
    val merged = t.rewriteDeleteFiles(t0)  // compact delete files, no data I/O
    // snapshot-summary count (Iceberg total-delete-files): no manifest scan
    def nDeleteFiles = t.currentSnapshot
      .flatMap(_.deleteFileCount).getOrElse(-1L)
    val deleteFiles = nDeleteFiles
    val rowsMor = t.read.count()
    t.optimize(clock = t0) // materializes the deletes
    import spark.implicits._
    Seq((rowsBefore, deleted, rowsMor, filesBefore, filesAfterDelete,
      merged, deleteFiles, nDeleteFiles, t.rowCount))
      .toDF("rows_before", "rows_deleted", "rows_after_mor_delete",
        "data_files_before", "data_files_after_delete",
        "delete_files_merged", "delete_files_after_merge",
        "delete_files_after_optimize", "rows_after_optimize")
  }

  /** Row-level changelog: appends emit inserts, MOR deletes emit the
    * removed rows; replaying insert∖delete reconstructs the table. */
  private def cdcDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("cdc"),
      seed(spark, sfDir).schema)
    val df = seed(spark, sfDir)
    t.append(df.filter(col("p_partkey") % 2 === 0), t0) // s1
    t.append(df.filter(col("p_partkey") % 2 === 1), t0) // s2
    t.deleteWhereMOR(col("p_partkey") % 5 === 0, t0)    // s3
    val ch = t.readChanges(0L, 3L)
    ch.groupBy(col("_commit_snapshot_id"), col("_change_type"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("table_rows_now", lit(t.rowCount))
      .orderBy(col("_commit_snapshot_id"), col("_change_type"))
  }

  /** One-commit merge-on-read UPSERT via equality deletes: matched keys
    * replaced, new keys inserted, zero data files rewritten; a second
    * upsert of the same key wins; optimize materializes. */
  private def upsertDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val t = GraftTable.create(spark, freshDir("upsert"),
      seed(spark, sfDir).schema)
    t.append(seed(spark, sfDir), t0)
    val rowsBefore = t.rowCount
    // file counts from the snapshot summary — metadata-only, no scan
    def nFiles = t.currentSnapshot.map(_.numFiles).getOrElse(0L)
    val filesBefore = nFiles
    val src = seed(spark, sfDir).filter(col("p_partkey") % 9 === 0)
      .withColumn("p_retailprice", col("p_retailprice") + 1000.0)
    val replaced = t.upsert(src, Seq("p_partkey"), t0)
    val filesAfterUpsert = nFiles
    val upsertedKeys = t.read.filter(col("p_partkey") % 9 === 0).count()
    t.optimize(clock = t0)
    import spark.implicits._
    // snapshot-summary count (Iceberg total-equality-deletes)
    Seq((rowsBefore, replaced, t.rowCount, filesBefore, filesAfterUpsert,
      upsertedKeys, t.currentSnapshot.flatMap(_.eqDeleteFileCount)
        .getOrElse(-1L)))
      .toDF("rows_before", "rows_replaced", "rows_after",
        "files_before", "files_after_upsert", "rows_with_upserted_keys",
        "eq_delete_files_after_optimize")
  }

  /** Partition-scoped optimize + the `"t$partitions"` metadata table:
    * a skewed hot partition arrives as several small files; compacting
    * names ONLY that partition — other partitions' files are carried
    * with their lineage, never listed as rewrite work (the nightly
    * "compact yesterday's partition" shape a 100 TB table needs). */
  private def partitionDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val df = graft.rel.Tables.load(spark, sfDir, "events") // ns→µs ts
    val loc = freshDir("partitions")
    val t = GraftTable.create(spark, loc, df.schema,
      partitionBy = Seq(graft.meta.PartitionSpec.days("ts")))
    val dayCol = datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
    val minDay = df.agg(min(dayCol)).head().getInt(0)
    // cold days in one commit; the hot day in 4 skewed micro-appends
    t.append(df.filter(dayCol =!= minDay), t0)
    val hot = df.filter(dayCol === minDay)
    (0 until 4).foreach(i =>
      t.append(hot.filter(pmod(hash(col("event_id")), lit(4)) === i), t0))
    // global file counts from the snapshot summary — metadata-only;
    // only the partition-scoped counts need a manifest scan
    def nFiles = t.currentSnapshot.map(_.numFiles).getOrElse(0L)
    val filesBefore = nFiles
    val hotFilesBefore = t.files.filter(t.partitionScope(
      Seq("days_ts" -> lit(minDay)))).count()
    t.optimizePartitions(Seq("days_ts" -> lit(minDay)), clock = t0)
    val hotFilesAfter = t.files.filter(t.partitionScope(
      Seq("days_ts" -> lit(minDay)))).count()
    spark.read.format("graft").option("metadata", "partitions").load(loc)
      .withColumn("files_before", lit(filesBefore))
      .withColumn("hot_partition_files_before", lit(hotFilesBefore))
      .withColumn("hot_partition_files_after", lit(hotFilesAfter))
      .withColumn("files_after", lit(nFiles))
      .orderBy(col("days_ts").asc_nulls_last, col("record_count"))
  }

  /** MERGE INTO (Trino's Iceberg upsert spelling) + equality-delete
    * compaction: three MERGE batches land three eq-delete files against
    * a table that never rewrites a data file; `rewriteEqDeleteFiles`
    * folds them into one per key set with ZERO data I/O; reads are
    * identical before/after and the snapshot summary tracks the
    * outstanding MOR debt metadata-only — the nightly "bound the
    * delete-file backlog a CDC stream accumulated" shape. */
  private def sqlMergeDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val base = Files.createTempDirectory("graft_sqlmerge")
    val resolve: String => GraftTable =
      n => GraftTable.load(spark, base.resolve(n).toString)
    def sql(s: String) = graft.sql.GraftSql.exec(spark, s, resolve, t0)
    val df = seed(spark, sfDir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
    val t = GraftTable.create(spark, base.resolve("t").toString, df.schema)
    t.append(df, t0)
    val rowsBefore = t.rowCount
    val src = GraftTable.create(spark, base.resolve("src").toString, df.schema)
    src.append(df.filter(col("p_partkey") % 9 === 0)
      .withColumn("p_retailprice", col("p_retailprice") + 1000.0), t0)
    val mergeStmt =
      """MERGE INTO t USING src ON t.p_partkey = src.p_partkey
        |WHEN MATCHED THEN UPDATE SET p_name = src.p_name,
        |  p_retailprice = src.p_retailprice
        |WHEN NOT MATCHED THEN INSERT (p_partkey, p_name, p_retailprice)
        |  VALUES (src.p_partkey, src.p_name, src.p_retailprice)""".stripMargin
    // two batches suffice to accumulate eq-delete debt (2 files → 1);
    // each extra batch is a whole commit floor on the demo clock
    (0 until 2).foreach(_ => sql(mergeStmt))
    // outstanding eq-delete debt from the snapshot summary — no scan
    def eqFiles = t.currentSnapshot.flatMap(_.eqDeleteFileCount).getOrElse(-1L)
    val eqBefore = eqFiles
    val merged = t.rewriteEqDeleteFiles(t0)
    val bumped = t.read.filter(col("p_retailprice") > 1000.0 &&
      col("p_partkey") % 9 === 0).count()
    import spark.implicits._
    Seq((rowsBefore, 2L, eqBefore, merged, eqFiles, t.rowCount, bumped))
      .toDF("rows_before", "merge_batches", "eq_delete_files_before",
        "eq_files_merged", "eq_delete_files_after", "rows_after",
        "rows_with_merged_price")
  }

  /** Schema evolution through the SQL dispatcher: ADD / RENAME / DROP
    * COLUMN are metadata-only commits (no data rewritten at any scale);
    * files written before the evolution resolve through stable field
    * ids, so renamed columns read back and pre-evolution rows surface
    * NULL for added columns; time travel to a pre-evolution snapshot
    * still works. */
  private def schemaDdlDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val base = Files.createTempDirectory("graft_ddl")
    val resolve: String => GraftTable =
      n => GraftTable.load(spark, base.resolve(n).toString)
    def sql(s: String) = graft.sql.GraftSql.exec(spark, s, resolve, t0)
    sql("CREATE TABLE t (k BIGINT, v VARCHAR)")
    sql("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c')") // snapshot 1
    sql("ALTER TABLE t ADD COLUMN score DOUBLE")
    sql("INSERT INTO t VALUES (4, 'd', 0.5), (5, 'e', 0.9)") // snapshot 2
    sql("ALTER TABLE t RENAME COLUMN v TO label")
    sql("ALTER TABLE t ADD COLUMN scratch INTEGER")
    sql("ALTER TABLE t DROP COLUMN scratch")
    // type widening: score double already; widen a fresh INTEGER column
    // to BIGINT, then land a value only the wide type can hold
    sql("ALTER TABLE t ADD COLUMN hits INTEGER")
    sql("ALTER TABLE t ALTER COLUMN hits SET DATA TYPE BIGINT")
    sql(s"INSERT INTO t VALUES (6, 'f', 1.0, ${Int.MaxValue.toLong + 9})")
    val t = resolve("t")
    val v1 = sql("SELECT * FROM t FOR VERSION AS OF 1").get
    import spark.implicits._
    Seq((t.schema.fieldNames.mkString(","), t.rowCount,
      t.read.filter(col("score").isNull).count(),
      t.read.filter(col("label") === "a").count(),
      t.read.filter(col("hits") > Int.MaxValue.toLong).count(),
      v1.count()))
      .toDF("columns_now", "rows_now", "pre_evolution_rows_null_score",
        "renamed_column_reads_old_files", "widened_rows_beyond_int",
        "rows_at_version_1")
  }

  /** Partition EVOLUTION (Trino spelling: `SET PROPERTIES partitioning
    * = ARRAY[...]`): a daily-partitioned events table switches to
    * bucket partitioning on the user key WITHOUT rewriting a byte —
    * on a 100 TB table the alternative is rewriting 100 TB. Old files
    * keep their lineage and day bounds; appends after the evolution
    * cluster by — and prune on — the new spec; pre-evolution files are
    * conservatively kept (superset guarantee). */
  private def partitionEvolutionDemo(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = fixedClock(20000)
    val df = graft.rel.Tables.load(spark, sfDir, "events")
    val t = GraftTable.create(spark, freshDir("pevolve"), df.schema,
      partitionBy = Seq(graft.meta.PartitionSpec.days("ts")))
    t.append(df, t0)
    val specBefore = t.partitionSpec.map(_.name).mkString(",")
    val filesBefore = t.files.select("path").collect().map(_.getString(0)).toSet
    graft.sql.GraftSql.exec(spark,
      "ALTER TABLE t SET PROPERTIES partitioning = ARRAY['bucket(user_id, 4)']",
      _ => t, t0)
    val untouched = t.files.select("path").collect()
      .map(_.getString(0)).toSet == filesBefore
    t.append(df, t0) // clusters by the NEW spec
    val b = graft.meta.PartitionSpec.bucket(4, "user_id").expr(lit(3L))
    val scan = t.readPrunedPartition("bucket4_user_id" -> b)
    import spark.implicits._
    Seq((specBefore, t.partitionSpec.map(_.name).mkString(","), untouched,
      scan.filesScanned, scan.filesTotal,
      scan.df.filter(col("user_id") === 3L).count()))
      .toDF("spec_before", "spec_after", "evolution_left_files_untouched",
        "files_scanned_bucket_of_user3", "files_total", "rows_user_3")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x16_partition_evolution" -> (partitionEvolutionDemo _),
    "x15_schema_ddl" -> (schemaDdlDemo _),
    "x14_sql_merge" -> (sqlMergeDemo _),
    "x13_partitions" -> (partitionDemo _),
    "x12_upsert" -> (upsertDemo _),
    "x11_cdc_read" -> (cdcDemo _),
    "x10_mor_delete" -> (morDeleteDemo _),
    "x09_incremental_read" -> (incrementalReadDemo _),
    "x01_optimize" -> (optimizeDemo _),
    "x02_expire_snapshots" -> (expireDemo _),
    "x03_remove_orphans" -> (orphanDemo _),
    "x04_analyze_stats" -> (analyzeDemo _),
    "x05_scheduler" -> (schedulerDemo _),
    "x06_incremental_analyze" -> (incrementalDemo _),
    "x07_rewrite_manifests" -> (rewriteManifestsDemo _),
    "x08_wap_branches" -> (wapDemo _))

  /** Maintenance state (file counts, snapshot ids) is not
    * SQL-expressible → most demos carry no oracle (driver does
    * rows-only checks; contracts pinned by ScalaTest). The two demos
    * whose OUTPUT is purely data-derived — incremental read / rollback
    * row counts and the changelog event counts — get real oracles: the
    * expected numbers recomputed from the part table itself, so a wrong
    * incremental scan, rollback, or changelog replay hash-mismatches. */
  val oracles: Map[String, String] = Map(
    "x09_incremental_read" ->
      """WITH c AS (SELECT
        |  count(CASE WHEN p_partkey % 3 = 1 THEN 1 END)
        |    + count(CASE WHEN p_partkey % 3 = 2 THEN 1 END) AS added,
        |  count(*) AS total,
        |  count(CASE WHEN p_partkey % 3 = 0 THEN 1 END)
        |    + count(CASE WHEN p_partkey % 3 = 1 THEN 1 END) AS r2
        |  FROM part)
        |SELECT added AS rows_added_since_snapshot1,
        |  total AS rows_at_snapshot3,
        |  r2 AS rows_after_rollback_to_2,
        |  total AS rows_snapshot3_by_id,
        |  CAST(2 AS BIGINT) AS main_head
        |FROM c""".stripMargin,
    "x11_cdc_read" ->
      """WITH c AS (SELECT
        |  count(CASE WHEN p_partkey % 2 = 0 THEN 1 END) AS even,
        |  count(CASE WHEN p_partkey % 2 = 1 THEN 1 END) AS odd,
        |  count(CASE WHEN p_partkey % 5 = 0 THEN 1 END) AS del,
        |  count(*) AS total
        |  FROM part)
        |SELECT CAST(1 AS BIGINT) AS _commit_snapshot_id,
        |  'insert' AS _change_type, even AS n_rows,
        |  total - del AS table_rows_now FROM c
        |UNION ALL SELECT 2, 'insert', odd, total - del FROM c
        |UNION ALL SELECT 3, 'delete', del, total - del FROM c
        |ORDER BY _commit_snapshot_id, _change_type""".stripMargin)
}
