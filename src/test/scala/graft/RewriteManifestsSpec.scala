package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Delta-manifest commits + rewrite_manifests metadata compaction. */
class RewriteManifestsSpec extends SparkSpec {

  test("appends accumulate delta manifests; totals and content stay exact") {
    val t = GraftTable.create(spark, tmpDir("rm1") + "/t",
      spark.range(1).select(col("id")).schema)
    (0 until 3).foreach(i =>
      t.append(spark.range(i * 100, (i + 1) * 100).select(col("id"))))
    val cur = t.currentSnapshot.get
    assert(cur.manifests.size == 3, "one delta manifest per append")
    assert(cur.totalRows == 300)
    assert(t.files.count() == cur.numFiles)
    assert(t.read.count() == 300)
  }

  test("rewrite_manifests merges to one manifest, preserving files and lineage") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("rm2") + "/t",
      spark.range(1).select(col("id")).schema)
    (0 until 3).foreach(i =>
      t.append(spark.range(i * 10, (i + 1) * 10).select(col("id")), clock))
    val filesBefore = t.files.select("path", "added_snapshot_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = t.rewriteManifests(clock)
    assert(merged == 3)
    val cur = t.currentSnapshot.get
    assert(cur.manifests.size == 1)
    assert(cur.operation == "rewrite_manifests")
    val filesAfter = t.files.select("path", "added_snapshot_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(filesAfter == filesBefore, "same data files, same added_snapshot_id")
    assert(t.read.count() == 30)
    // idempotent: a single-manifest snapshot is a no-op
    assert(t.rewriteManifests(clock) == 0L)
  }

  test("time travel: readAsOf sees each snapshot's exact content") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("tt") + "/t",
      spark.range(1).select(col("id")).schema)
    t.append(spark.range(0, 10).select(col("id")), clock)
    val v1 = t.currentSnapshot.get.snapshotId
    val t1Ms = clock.millis()
    clock.advanceDays(1)
    t.append(spark.range(10, 30).select(col("id")), clock)
    val v2 = t.currentSnapshot.get.snapshotId
    assert(t.readAsOf(v1).count() == 10)
    assert(t.readAsOf(v2).count() == 30)
    assert(t.read.count() == 30)
    assert(t.readAsOfTime(t1Ms).count() == 10)
    assert(t.readAsOfTime(clock.millis()).count() == 30)
    assert(t.readAsOfTime(t1Ms - 1000000L).count() == 0, "before first commit")
  }

  test("sort-order optimize clusters files so readPruned skips most of them") {
    val t = GraftTable.create(spark, tmpDir("cluster") + "/t",
      spark.range(1).select(col("id")).schema)
    // Shuffled appends: every file spans ~the full id range -> no pruning.
    (0 until 4).foreach(i =>
      t.append(spark.range(0, 800).select(col("id"))
        .filter(col("id") % 4 === i).repartition(2)))
    val before = t.readPruned("id", lit(0L), lit(99L))
    assert(before.filesScanned == before.filesTotal, "interleaved: no skipping")
    t.optimize(targetFileBytes = 4L * 1024, clusterBy = Seq("id"))
    val after = t.readPruned("id", lit(0L), lit(99L))
    assert(after.filesTotal > 1, "compaction should still emit several files")
    assert(after.filesScanned < after.filesTotal,
      s"clustered: expected skipping, got ${after.filesScanned}/${after.filesTotal}")
    assert(after.df.filter(col("id") <= 99).count() == 100)
  }

  test("expire after rewrite reclaims superseded delta manifests, keeps data") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("rm3") + "/t",
      spark.range(1).select(col("id")).schema)
    (0 until 3).foreach(i =>
      t.append(spark.range(i * 10, (i + 1) * 10).select(col("id")), clock))
    val oldManifests = t.currentSnapshot.get.manifests
    t.rewriteManifests(clock)
    clock.advanceDays(30)
    val deletedFiles = t.expireSnapshots(retentionDays = 5, clock)
    assert(deletedFiles == 0, "rewrite shares data files — none reclaimable")
    oldManifests.foreach { p =>
      assert(!t.fileSystem.exists(new org.apache.hadoop.fs.Path(p)),
        s"superseded manifest $p should be reclaimed")
    }
    assert(t.read.count() == 30, "data survives manifest reclamation")
  }
}
