package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** Row-level changelog (readChanges): appends emit inserts, MOR
  * deletes emit the removed rows, commit order is stamped, replacement
  * commits are refused. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id", concat(lit("v"), $"id").as("v"))

  test("changelog emits inserts and deletes in commit order") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc1") + "/t", schema)
    t.append(rows(0, 10), clock)                    // s1: +10
    t.append(rows(10, 15), clock)                   // s2: +5
    t.deleteWhereMOR($"id" % 3 === 0, clock)        // s3: -5 (0,3,6,9,12)
    t.append(rows(15, 18), clock)                   // s4: +3

    val ch = t.readChanges(0L, 4L)
    assert(ch.columns.toSeq ==
      Seq("id", "v", "_change_type", "_commit_snapshot_id"))
    val byCommit = ch.groupBy($"_commit_snapshot_id", $"_change_type")
      .count().as[(Long, String, Long)].collect().toSet
    assert(byCommit == Set(
      (1L, "insert", 10L), (2L, "insert", 5L),
      (3L, "delete", 5L), (4L, "insert", 3L)))
    // the delete events carry the full deleted rows
    assert(ch.filter($"_change_type" === "delete").select("id")
      .as[Long].collect().sorted.toSeq == Seq(0L, 3L, 6L, 9L, 12L))
    // a row appended then deleted in-range appears twice
    assert(ch.filter($"id" === 3).count() == 2)

    // sub-range: only s3's delete and s4's insert
    val tail = t.readChanges(2L, 4L)
    assert(tail.filter($"_change_type" === "insert").count() == 3)
    assert(tail.filter($"_change_type" === "delete").count() == 5)

    // replaying the changelog reconstructs the table state
    val replayed = ch.filter($"_change_type" === "insert").select("id")
      .except(ch.filter($"_change_type" === "delete").select("id"))
    assert(replayed.as[Long].collect().sorted.toSeq ==
      t.read.select("id").as[Long].collect().sorted.toSeq)
  }

  test("replacement commits in the range are refused loudly") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc2") + "/t", schema)
    t.append(rows(0, 10).repartition(2), clock)
    t.append(rows(10, 20).repartition(2), clock)
    t.optimize(clock = clock) // s3: replacement
    t.append(rows(20, 25), clock)
    val e = intercept[IllegalArgumentException](t.readChanges(0L, 4L))
    assert(e.getMessage.contains("changelog supports"))
    // a range past the rewrite works
    assert(t.readChanges(3L, 4L).count() == 5)
  }

  test("empty ranges and no-op boundaries") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc3") + "/t", schema)
    t.append(rows(0, 5), clock)
    assert(t.readChanges(1L, 1L).count() == 0)
    intercept[IllegalArgumentException](t.readChanges(1L, 9L))
  }

  test("copy-on-write DELETE (and truncate) in the range is refused") {
    // CoW deleteWhere is a replacement commit — the survivors are
    // REWRITTEN into new files with no row-level lineage. It must not
    // share the MOR delete's op name, or the changelog would emit the
    // rewritten survivors as spurious inserts and no delete events.
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc4") + "/t", schema)
    t.append(rows(0, 10).repartition(2), clock)
    t.deleteWhere($"id" < 3, clock) // s2: CoW replacement, op cow_delete
    t.append(rows(10, 12), clock)   // s3
    val e = intercept[IllegalArgumentException](t.readChanges(0L, 3L))
    assert(e.getMessage.contains("cow_delete"))
    // a range past the CoW commit works, and emits only the append
    assert(t.readChanges(2L, 3L).count() == 2)

    // bare truncate (DELETE FROM t) takes the same CoW path
    val t2 = GraftTable.create(spark, tmpDir("cdc5") + "/t", schema)
    t2.append(rows(0, 5), clock)
    t2.deleteWhere(lit(true), clock)
    t2.append(rows(5, 8), clock)
    intercept[IllegalArgumentException](t2.readChanges(0L, 3L))
  }

  test("ranges reaching expired history are refused, including from 0") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc6") + "/t", schema)
    t.append(rows(0, 5), clock)   // s1
    t.append(rows(5, 10), clock)  // s2
    clock.advanceDays(10)
    t.append(rows(10, 15), clock) // s3 (head, pinned)
    t.expireSnapshots(5, clock) // s1, s2 drop out of the log
    assert(t.snapshots.map(_.snapshotId) == Seq(3L))
    // s3's parent (s2) is expired: a whole-history read would emit s3's
    // carried state wrong — refuse instead of silently mis-reporting
    val e = intercept[IllegalArgumentException](t.readChanges(0L, 3L))
    assert(e.getMessage.contains("expired"))
    // an empty in-retention range still works
    assert(t.readChanges(3L, 3L).count() == 0)
  }
}
