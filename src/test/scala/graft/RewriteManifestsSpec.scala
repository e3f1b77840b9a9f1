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
