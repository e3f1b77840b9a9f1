package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** Time travel through the DataSource (Iceberg Spark's option shape) —
  * snapshot pinning with pushdown/file-skipping intact — and Trino's
  * branch/tag-name `FOR VERSION AS OF` spelling. */
class TimeTravelReadSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id", concat(lit("v"), $"id").as("v"))

  test("DataSource options: snapshotId, branch, tag, asOfTimestamp") {
    val loc = tmpDir("tt") + "/t"
    val clock = new TestClock
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 10), clock)  // s1
    clock.advanceDays(1)
    t.append(rows(10, 20), clock) // s2
    t.createTag("v1", Some(1L))
    t.createBranch("dev")
    t.appendToBranch("dev", rows(20, 30), clock) // s3, dev only
    def read(opts: (String, String)*) = {
      val r = spark.read.format("graft")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(loc)
    }
    assert(read().count() == 20, "main must not see the branch append")
    assert(read("snapshotId" -> "1").count() == 10)
    assert(read("branch" -> "dev").count() == 30)
    assert(read("tag" -> "v1").count() == 10)
    // newest snapshot at s1's commit time is s1 (s2 is a day later)
    val ts1 = t.snapshots.find(_.snapshotId == 1L).get.timestampMs
    assert(read("asOfTimestamp" -> ts1.toString).count() == 10)
    // a pinned scan still pushes filters down to the parquet scan
    assert(read("snapshotId" -> "1").filter($"id" === 3L).count() == 1)

    intercept[IllegalArgumentException](
      read("snapshotId" -> "1", "branch" -> "dev").count())
    intercept[IllegalArgumentException](read("branch" -> "nope").count())
    intercept[IllegalArgumentException](read("snapshotId" -> "99").count())
  }

  test("SQL: FOR VERSION AS OF takes a branch or tag name (Trino)") {
    val loc = tmpDir("ttsql") + "/t"
    val clock = new TestClock
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 10), clock)
    t.createTag("launch")
    t.append(rows(10, 15), clock)
    t.createBranch("dev")
    t.appendToBranch("dev", rows(15, 18), clock)
    def sql(s: String) = graft.sql.GraftSql.exec(spark, s, _ => t, clock)
    assert(sql("SELECT * FROM t FOR VERSION AS OF 'dev'").get.count() == 18)
    assert(sql("SELECT * FROM t FOR VERSION AS OF 'launch'").get.count() == 10)
    assert(sql("SELECT * FROM t FOR VERSION AS OF 2").get.count() == 15)
    intercept[IllegalArgumentException](
      sql("SELECT * FROM t FOR VERSION AS OF 'nope'"))
  }

  test("a tag pins its snapshot AND files through expiry; drop releases both") {
    val loc = tmpDir("tagpin") + "/t"
    val clock = new TestClock
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 10).repartition(2), clock) // s1: 2 files
    t.createTag("audit")                        // pins s1
    t.optimize(clock = clock)                   // s2: supersedes s1's files
    clock.advanceDays(11)
    t.append(rows(10, 15), clock)               // s3: head
    // while tagged: s1 survives the cutoff, and so do its 2 superseded
    // files — nothing is reclaimable
    assert(t.expireSnapshots(retentionDays = 5, clock = clock) == 0L)
    assert(t.readTag("audit").count() == 10)
    assert(t.snapshots.map(_.snapshotId).toSet == Set(1L, 3L),
      "unpinned old s2 expires; pinned s1 and current s3 stay")
    t.dropTag("audit")
    // released: s1 expires and exactly its 2 compacted-away files go
    assert(t.expireSnapshots(retentionDays = 5, clock = clock) == 2L)
    assert(t.snapshots.map(_.snapshotId) == Seq(3L))
    assert(t.read.count() == 15, "live content untouched throughout")
    intercept[IllegalArgumentException](t.readTag("audit"))
  }
}
