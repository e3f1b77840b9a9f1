package graft

import java.net.URI

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.meta.GraftTable
import graft.sched.{ConfigStore, MaintenanceConfig, Scheduler}

/** Behavioral mirrors of the reference's three end-to-end tests
  * (tests/test_maintenance.py:41-169) plus coverage for what the
  * reference leaves untested (SURVEY.md §5): expire_snapshots,
  * remove_orphan_files, concurrency, failure isolation, and the
  * snapshot-layer invariants.
  */
class MaintenanceSpec extends SparkSpec {

  private val ab = StructType(Seq(
    StructField("a", StringType), StructField("b", StringType)))

  private case class Fx(clock: TestClock, store: ConfigStore,
                        dir: String, sched: Scheduler) {
    def table(name: String): GraftTable = GraftTable.load(spark, s"$dir/$name")
    def createTable(name: String): GraftTable =
      GraftTable.create(spark, s"$dir/$name", ab)
    def insert(name: String, vals: (String, String)*): Unit =
      table(name).append(
        spark.createDataFrame(
          vals.map { case (a, b) => Row(a, b) }.asJava, ab),
        clock)
    def fileCount(name: String): Long = table(name).files.count()
    def nullsFraction(name: String, colIdx: Int): Any =
      table(name).stats.collect()(colIdx).get(3)
  }

  private def fixture(prefix: String): Fx = {
    val clock = new TestClock
    val dir = tmpDir(prefix)
    val store = new ConfigStore(spark, s"$dir/cfg").createIfNotExists()
    val sched = new Scheduler(store,
      n => GraftTable.load(spark, s"$dir/$n"), numWorkers = 5, clock = clock)
    Fx(clock, store, dir, sched)
  }

  private def cfg(name: String): MaintenanceConfig =
    MaintenanceConfig(name, None, None, None, None, None, None, None,
      None, None, None, None)

  private def exists(enginePath: String): Boolean =
    new java.io.File(new URI(enginePath).getPath).exists()

  // ---- mirror of test_optimize (tests/test_maintenance.py:41-78) -------

  test("optimize: 2 files -> 1, gated by days_to_optimize") {
    val fx = fixture("opt")
    fx.createTable("t")
    fx.insert("t", ("a", "b"))
    fx.insert("t", ("a", "b"))
    assert(fx.fileCount("t") == 2)

    // maintenance without config is a no-op
    assert(fx.sched.run().isEmpty)
    assert(fx.fileCount("t") == 2)

    fx.store.insert(cfg("t").copy(should_optimize = Some(1),
      days_to_optimize = Some(10)))
    assert(fx.sched.run().forall(_.isRight))
    assert(fx.fileCount("t") == 1)

    // fresh stamp -> second run must NOT re-optimize
    fx.insert("t", ("a", "b"))
    assert(fx.fileCount("t") == 2)
    fx.sched.run()
    assert(fx.fileCount("t") == 2)

    // after the configured delta it runs again
    fx.clock.advanceDays(11)
    fx.sched.run()
    assert(fx.fileCount("t") == 1)
  }

  test("optimize preserves the row multiset") {
    val fx = fixture("optrows")
    fx.createTable("t")
    fx.insert("t", ("x", "1"), ("y", "2"), ("x", "1"))
    fx.insert("t", ("z", null), (null, "3"))
    val before = fx.table("t").read.collect().map(_.toSeq).sortBy(_.toString)
    fx.table("t").optimize(clock = fx.clock)
    assert(fx.fileCount("t") == 1)
    val after = fx.table("t").read.collect().map(_.toSeq).sortBy(_.toString)
    assert(before.toSeq == after.toSeq)
  }

  test("optimize binpack: compacts only undersized files, carries big ones") {
    val fx = fixture("binpack")
    val t = fx.createTable("t")
    // one file well above the 0.75*target candidate threshold...
    val bigRows = (1 to 4000).map(i => Row(s"k$i", s"v$i"))
    t.append(spark.createDataFrame(bigRows.asJava, ab).coalesce(1), fx.clock)
    // ...plus three tiny files
    fx.insert("t", ("s1", "1")); fx.insert("t", ("s2", "2"))
    fx.insert("t", ("s3", "3"))
    val before = t.files.select("path", "size_bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.size == 4)
    val bigPath = before.maxBy(_._2)._1
    // target chosen so the big file sits IN the [0.75x, 1.8x] band —
    // neither a compaction nor a split candidate
    val target = before(bigPath)
    assert(before(bigPath) >= (target * 3) / 4)

    fx.table("t").optimize(targetFileBytes = target, clock = fx.clock)
    val after = fx.table("t").files.select("path").collect()
      .map(_.getString(0)).toSet
    assert(after.size == 2) // 3 small -> 1, big carried through
    assert(after.contains(bigPath)) // byte-identical path, never rewritten
    assert(fx.table("t").read.count() == 4003)
    // candidate gate: a second run finds one small file -> no-op commit
    val snaps = fx.table("t").snapshots.size
    fx.table("t").optimize(targetFileBytes = target, clock = fx.clock)
    assert(fx.table("t").snapshots.size == snaps)
  }

  test("optimize binpack: splits oversized files, carries in-band ones") {
    val fx = fixture("binsplit")
    val t = fx.createTable("t")
    // one oversized file (~4x the in-band one) and one in-band file
    val bigRows = (1 to 8000).map(i => Row(s"key$i", s"val$i"))
    t.append(spark.createDataFrame(bigRows.asJava, ab).coalesce(1), fx.clock)
    val midRows = (1 to 2000).map(i => Row(s"m$i", s"w$i"))
    t.append(spark.createDataFrame(midRows.asJava, ab).coalesce(1), fx.clock)
    val before = t.files.select("path", "size_bytes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before.size == 2)
    val bigPath = before.maxBy(_._2)._1
    val midPath = (before.keySet - bigPath).head
    // target: mid lands in-band (~0.9x), big lands above the 1.8x split bar
    val target = (before(midPath) / 0.9).toLong
    assert(before(midPath) > (target * 3) / 4 && before(midPath) < target * 9 / 5)
    assert(before(bigPath) > target * 9 / 5, "premise: big file is oversized")

    t.optimize(targetFileBytes = target, clock = fx.clock)
    val after = fx.table("t").files.select("path").collect()
      .map(_.getString(0)).toSet
    assert(after.contains(midPath), "in-band file carried untouched")
    assert(!after.contains(bigPath), "oversized file replaced")
    assert((after - midPath).size >= 2,
      s"oversized file must split into multiple (got ${after.size - 1})")
    assert(fx.table("t").read.count() == 10000)
  }

  // ---- mirror of test_analyze_without_colums (:81-123) -----------------

  test("analyze all columns: live fractions, then pinned until re-analyze") {
    val fx = fixture("ana")
    fx.createTable("t")
    fx.insert("t", (null, null))
    fx.insert("t", (null, null))
    // live manifest-derived stats before any analyze
    assert(fx.nullsFraction("t", 0) == 1.0)

    assert(fx.sched.run().isEmpty) // no config -> no-op
    assert(fx.nullsFraction("t", 0) == 1.0)

    fx.store.insert(cfg("t").copy(should_analyze = Some(1),
      days_to_analyze = Some(10)))
    assert(fx.sched.run().forall(_.isRight))
    assert(fx.nullsFraction("t", 0) == 1.0)

    // analyzed stats are pinned: the non-null insert doesn't move them
    fx.insert("t", ("a", "b"))
    assert(fx.nullsFraction("t", 0) == 1.0)
    fx.sched.run() // still gated
    assert(fx.nullsFraction("t", 0) == 1.0)

    fx.clock.advanceDays(11)
    fx.sched.run()
    assert(fx.nullsFraction("t", 0) == 2.0 / 3.0)
  }

  // ---- mirror of test_analyze_with_colums (:126-169) -------------------

  test("analyze column subset: only named columns pinned; others live") {
    val fx = fixture("anacols")
    fx.createTable("t")
    fx.insert("t", (null, null))
    fx.insert("t", (null, null))
    assert(fx.nullsFraction("t", 0) == 1.0)

    fx.store.insert(cfg("t").copy(should_analyze = Some(1),
      days_to_analyze = Some(10), columns_to_analyze = Some(Seq("a"))))
    fx.sched.run()
    assert(fx.nullsFraction("t", 0) == 1.0)
    assert(fx.nullsFraction("t", 1) == 1.0)

    // a is pinned by its analyze; never-analyzed b tracks the data live
    fx.insert("t", ("a", "b"))
    assert(fx.nullsFraction("t", 0) == 1.0)
    assert(fx.nullsFraction("t", 1) == 2.0 / 3.0)

    fx.clock.advanceDays(11)
    fx.sched.run()
    assert(fx.nullsFraction("t", 0) == 2.0 / 3.0)
    assert(fx.nullsFraction("t", 1) == 2.0 / 3.0)
  }

  test("stats relation shape: schema-order rows + summary row_count") {
    val fx = fixture("shape")
    fx.createTable("t")
    fx.insert("t", ("a", null), ("b", "c"))
    val rows = fx.table("t").stats.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", null))
    assert(rows(2).getDouble(4) == 2.0) // live row count on summary row
    fx.table("t").analyze(clock = fx.clock)
    val analyzed = fx.table("t").stats.collect()
    assert(analyzed(0).getDouble(3) == 0.0) // a: no nulls
    assert(analyzed(0).getDouble(2) == 2.0) // ndv(a) = 2
    assert(analyzed(0).getString(5) == "a") // low_value
    assert(analyzed(0).getString(6) == "b") // high_value
    assert(analyzed(1).getDouble(3) == 0.5)
  }

  // ---- expire_snapshots (untested in the reference) --------------------

  test("expire_snapshots deletes only files exclusive to expired snapshots") {
    val fx = fixture("expire")
    fx.createTable("t")
    fx.insert("t", ("a", "1"))
    fx.insert("t", ("b", "2"))
    fx.table("t").optimize(clock = fx.clock) // snap 3: replaces both files
    val originals = fx.table("t").snapshots
      .filter(_.operation == "append")
    assert(originals.size == 2)

    fx.clock.advanceDays(11)
    fx.insert("t", ("c", "3")) // snap 4 (fresh) carries the optimized file
    val preExpirePaths =
      fx.table("t").files.select("path").collect().map(_.getString(0))

    val deleted = fx.table("t").expireSnapshots(5, fx.clock)
    // snaps 1-3 expired; the two pre-optimize originals are exclusive
    assert(deleted == 2)
    assert(fx.table("t").snapshots.map(_.snapshotId) == Seq(4))
    // every live file survived, table still reads fully
    assert(preExpirePaths.forall(exists))
    val data = fx.table("t").read.collect().map(_.getString(0)).sorted
    assert(data.toSeq == Seq("a", "b", "c"))
  }

  test("expire plan agrees with run: would_expire == actually-expired, " +
      "and planning mutates nothing (x23)") {
    val fx = fixture("expplan")
    fx.createTable("t")
    fx.insert("t", ("a", "1"))
    fx.insert("t", ("b", "2"))
    fx.table("t").optimize(clock = fx.clock)
    fx.clock.advanceDays(11)
    fx.insert("t", ("c", "3"))
    // also pin a ref: a tagged old snapshot must be retained by BOTH
    // plan and run (the predicate is shared — this exercises it)
    fx.table("t").createTag("keep", Some(2L))

    val before = fx.table("t").snapshots.map(_.snapshotId)
    val plan = graft.cmd.ExpireSnapshots.plan(fx.table("t"), 5, fx.clock)
      .collect()
    // planning is a pure read: log untouched, data untouched
    assert(fx.table("t").snapshots.map(_.snapshotId) == before)
    assert(fx.table("t").read.collect().map(_.getString(0)).sorted.toSeq
      == Seq("a", "b", "c"))

    val wouldExpire = plan.filter(_.getAs[Boolean]("would_expire"))
      .map(_.getAs[Long]("snapshotId")).toSet
    val plannedReclaim = plan.head.getAs[Long]("reclaimable_files")

    val deleted = fx.table("t").expireSnapshots(5, fx.clock)
    val after = fx.table("t").snapshots.map(_.snapshotId).toSet
    // the shared predicate guarantees agreement BY CONSTRUCTION; this
    // pins it against future drift
    assert(before.toSet -- after == wouldExpire,
      "plan's would_expire set must equal run's actually-expired set")
    assert(deleted == plannedReclaim,
      "plan's reclaimable count must equal run's deleted count")
    assert(!wouldExpire.contains(2L), "tag-pinned snapshot never expires")
  }

  test("orphan plan agrees with run: would_delete == actually-deleted, " +
      "and planning mutates nothing (x24)") {
    val fx = fixture("orphplan")
    fx.createTable("t")
    fx.insert("t", ("a", "1"))
    fx.insert("t", ("b", "2"))
    // a stray uncommitted file under data/
    val stray = new java.io.File(s"${fx.dir}/t/data/stray.parquet")
    java.nio.file.Files.writeString(stray.toPath, "junk")
    val future = new TestClock(java.time.Instant.parse("2036-01-01T00:00:00Z"))

    val plan = graft.cmd.RemoveOrphanFiles.plan(fx.table("t"), 5, future)
      .collect().head
    // planning is a pure read: the stray is still there, content intact
    assert(stray.exists())
    assert(fx.table("t").read.count() == 2)
    assert(plan.getAs[Long]("would_delete") == 1L)
    assert(plan.getAs[Long]("files_on_disk") == 3L)

    val deleted = fx.table("t").removeOrphanFiles(5, future)
    assert(deleted == plan.getAs[Long]("would_delete"),
      "plan's would_delete must equal run's deleted count (shared orphanSet)")
    assert(!stray.exists())
    assert(fx.table("t").read.count() == 2)
  }

  test("expire_snapshots with everything inside retention is a no-op") {
    val fx = fixture("expnoop")
    fx.createTable("t")
    fx.insert("t", ("a", "1"))
    fx.insert("t", ("b", "2"))
    assert(fx.table("t").expireSnapshots(5, fx.clock) == 0)
    assert(fx.table("t").snapshots.size == 2)
  }

  // ---- remove_orphan_files (untested in the reference) -----------------

  test("remove_orphan_files deletes old unreferenced files only") {
    val fx = fixture("orphan")
    fx.createTable("t")
    fx.insert("t", ("a", "1"))
    // plant two orphans under data/: one old, one recent
    val dataDir = java.nio.file.Paths.get(s"${fx.dir}/t/data")
    val oldOrphan = dataDir.resolve("stray-old.parquet")
    val newOrphan = dataDir.resolve("stray-new.parquet")
    java.nio.file.Files.write(oldOrphan, "junk".getBytes)
    java.nio.file.Files.write(newOrphan, "junk".getBytes)
    java.nio.file.Files.setLastModifiedTime(oldOrphan,
      java.nio.file.attribute.FileTime.fromMillis(
        fx.clock.millis() - 10L * 86400000L))

    val deleted = fx.table("t").removeOrphanFiles(3, fx.clock)
    assert(deleted == 1)
    assert(!java.nio.file.Files.exists(oldOrphan))
    assert(java.nio.file.Files.exists(newOrphan)) // inside retention window
    // live data untouched
    assert(fx.table("t").read.count() == 1)
  }

  test("distributed orphan listing finds exactly the driver listing's set") {
    // two identical tables, same orphans planted; one reconciled with the
    // default driver listing, one with the prefix-sharded executor
    // listing — deleted counts and surviving files must match
    def build(tag: String): Fx = {
      val fx = fixture(tag)
      fx.createTable("t")
      (0 until 4).foreach(i => fx.insert("t", (s"a$i", s"b$i"))) // 4 commit dirs
      val dataDir = java.nio.file.Paths.get(s"${fx.dir}/t/data")
      // orphans: one loose under data/, one inside a fake commit dir
      val strayDir = dataDir.resolve("stray-commit")
      java.nio.file.Files.createDirectories(strayDir)
      Seq(dataDir.resolve("stray-loose.parquet"),
        strayDir.resolve("part-0.parquet")).foreach { p =>
        java.nio.file.Files.write(p, "junk".getBytes)
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            fx.clock.millis() - 10L * 86400000L))
      }
      fx
    }
    def survivors(fx: Fx): Set[String] =
      GraftTable.listFiles(fx.table("t").fileSystem,
        new org.apache.hadoop.fs.Path(s"${fx.dir}/t/data"))
        .map(_.getPath.getName).toSet

    val fxDriver = build("orphdrv")
    val fxDist = build("orphdist")
    val dDriver = fxDriver.table("t").removeOrphanFiles(3, fxDriver.clock)
    spark.conf.set("spark.graft.removeOrphans.distributedListing", "true")
    val dDist =
      try fxDist.table("t").removeOrphanFiles(3, fxDist.clock)
      finally spark.conf.unset("spark.graft.removeOrphans.distributedListing")
    assert(dDriver == 2 && dDist == 2)
    // same structural outcome: both strays gone, every live file kept
    // (live part-file names differ by write UUID, so compare shape)
    Seq(fxDriver, fxDist).foreach { fx =>
      val left = survivors(fx)
      assert(left.size == 4, s"expected the 4 live files, got $left")
      assert(!left.exists(_.startsWith("stray")), s"stray survived: $left")
      assert(fx.table("t").read.count() == 4)
    }
  }

  // ---- scheduler: concurrency + failure isolation ----------------------

  test("scheduler maintains many tables on a bounded pool") {
    val fx = fixture("pool")
    val names = (1 to 4).map(i => s"t$i")
    names.foreach { n =>
      fx.createTable(n)
      fx.insert(n, ("a", "b"))
      fx.insert(n, ("c", "d"))
      fx.store.insert(cfg(n).copy(should_optimize = Some(1),
        days_to_optimize = Some(10)))
    }
    val results = new Scheduler(fx.store,
      n => GraftTable.load(spark, s"${fx.dir}/$n"),
      numWorkers = 2, clock = fx.clock).run()
    assert(results.size == 4 && results.forall(_.isRight))
    names.foreach(n => assert(fx.fileCount(n) == 1))
  }

  test("one table's failure never aborts the batch") {
    val fx = fixture("failsoft")
    fx.createTable("good")
    fx.insert("good", ("a", "b"))
    fx.insert("good", ("c", "d"))
    fx.store.insert(
      // 'missing' has no schema on disk -> analyze throws
      cfg("missing").copy(should_analyze = Some(1), days_to_analyze = Some(1)),
      cfg("good").copy(should_optimize = Some(1), days_to_optimize = Some(10)))
    val results = fx.sched.run()
    assert(results.count(_.isRight) == 1)
    assert(results.collect { case Left(f) => f.config.table_name } == Seq("missing"))
    assert(fx.fileCount("good") == 1) // the good table was still optimized
  }

  test("drop removes the table and its metadata") {
    val fx = fixture("drop")
    fx.createTable("t")
    fx.insert("t", ("a", "b"))
    assert(GraftTable.exists(spark, s"${fx.dir}/t"))
    fx.table("t").drop()
    assert(!GraftTable.exists(spark, s"${fx.dir}/t"))
    assert(!new java.io.File(s"${fx.dir}/t").exists())
  }

  test("optimize/analyze gate stamps are persisted via copy-on-write UPDATE") {
    val fx = fixture("stamp")
    fx.createTable("t")
    fx.insert("t", ("a", "b"))
    fx.insert("t", ("c", "d"))
    fx.store.insert(cfg("t").copy(should_optimize = Some(1),
      days_to_optimize = Some(10)))
    fx.sched.run()
    val row = fx.store.load().head
    assert(row.last_optimized_on.exists(_.getTime == fx.clock.millis()))
    assert(row.last_analyzed_on.isEmpty)
  }
}
