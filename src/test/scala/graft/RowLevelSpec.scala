package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Copy-on-write DELETE / MERGE: correctness plus the only-touched-files
  * rewrite guarantee. */
class RowLevelSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() = {
    val t = GraftTable.create(spark, tmpDir("rowlevel") + "/t",
      spark.range(1).select(col("id"), lit("x").as("tag")).schema)
    // 4 range-clustered files: ids 0-249 / 250-499 / 500-749 / 750-999
    t.append(spark.range(0, 1000)
      .select(col("id"), concat(lit("v"), col("id")).as("tag"))
      .repartitionByRange(4, col("id")))
    t
  }

  test("deleteWhere removes matching rows and rewrites only affected files") {
    val t = freshTable()
    val filesBefore = t.files.select("path", "added_snapshot_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val deleted = t.deleteWhere(col("id") < 100)
    assert(deleted == 100)
    assert(t.read.count() == 900)
    assert(t.read.filter(col("id") < 100).count() == 0)
    val after = t.files.select("path", "added_snapshot_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val untouched = after.keySet.intersect(filesBefore.keySet)
    assert(untouched.nonEmpty, "files without matches must be carried as-is")
    untouched.foreach(p => assert(after(p) == filesBefore(p), "lineage kept"))
    assert(after.keySet != filesBefore.keySet, "affected file was rewritten")
  }

  test("deleteWhere keeps rows where the predicate evaluates NULL") {
    val t = GraftTable.create(spark, tmpDir("rowlevel") + "/t",
      Seq((1L, Some(5L))).toDF("id", "v").schema)
    t.append(Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
      .toDF("id", "v"))
    // SQL DELETE semantics: only TRUE deletes; v=null row must survive
    assert(t.deleteWhere(col("v") < 10) == 1)
    assert(t.read.orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(2L, 3L))
  }

  test("deleteWhere with no matches commits nothing") {
    val t = freshTable()
    val snapBefore = t.currentSnapshot.get.snapshotId
    assert(t.deleteWhere(col("id") > 10000) == 0L)
    assert(t.currentSnapshot.get.snapshotId == snapBefore)
  }

  test("merge with an empty source commits nothing") {
    val t = freshTable()
    val head = t.currentSnapshot.get.snapshotId
    t.merge(spark.range(0, 0)
      .select(col("id"), lit("z").as("tag")), Seq("id"))
    assert(t.currentSnapshot.get.snapshotId == head,
      "an empty MERGE must not land a junk commit")
    assert(t.read.count() == 1000)
  }

  test("deleteWhere matching everything leaves zero data files, no empties") {
    val t = freshTable()
    assert(t.deleteWhere(lit(true)) == 1000L)
    assert(t.read.count() == 0)
    // the rewrite's schema-only empty outputs are pruned — the manifest
    // must not carry junk zero-row files
    assert(t.files.count() == 0,
      "delete-everything must leave an empty manifest")
  }

  test("merge upserts: updates replace by key, inserts append, one commit") {
    val t = freshTable()
    val snapBefore = t.currentSnapshot.get.snapshotId
    val source = Seq((5L, "UPDATED"), (2000L, "NEW")).toDF("id", "tag")
    t.merge(source, Seq("id"))
    assert(t.currentSnapshot.get.snapshotId == snapBefore + 1, "single commit")
    assert(t.read.count() == 1001)
    val byId = t.read.filter(col("id").isin(5L, 6L, 2000L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(5L) == "UPDATED")
    assert(byId(6L) == "v6", "non-matched row in an affected file survives")
    assert(byId(2000L) == "NEW")
  }
}
