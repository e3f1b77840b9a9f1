package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** Row-level changelog (readChanges): appends emit inserts, MOR
  * deletes emit the removed rows, commit order is stamped; CoW
  * delete/merge commits emit their NET changes via multiset diff
  * (carry-over elimination), compactions emit nothing, and replacement
  * commits without recoverable lineage are refused. */
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

  test("compactions in the range emit zero events") {
    // optimize rewrites bytes, not logical rows — the changelog reads
    // through it the way Iceberg's incremental scans skip REPLACE
    // snapshots; only the real appends surface
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc2") + "/t", schema)
    t.append(rows(0, 10).repartition(2), clock)
    t.append(rows(10, 20).repartition(2), clock)
    t.optimize(clock = clock) // s3: replacement, row-neutral
    t.append(rows(20, 25), clock)
    val byCommit = t.readChanges(0L, 4L)
      .groupBy($"_commit_snapshot_id", $"_change_type")
      .count().as[(Long, String, Long)].collect().toSet
    assert(byCommit == Set(
      (1L, "insert", 10L), (2L, "insert", 10L), (4L, "insert", 5L)))
    assert(t.readChanges(3L, 4L).count() == 5)
  }

  test("overwrites in the range are refused loudly") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc2b") + "/t", schema)
    t.append(rows(0, 10), clock)
    t.overwrite(rows(20, 25), clock) // s2: no recoverable lineage
    t.append(rows(10, 12), clock)
    val e = intercept[IllegalArgumentException](t.readChanges(0L, 3L))
    assert(e.getMessage.contains("changelog supports"))
    // a range past the overwrite works
    assert(t.readChanges(2L, 3L).count() == 2)
  }

  test("empty ranges and no-op boundaries") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc3") + "/t", schema)
    t.append(rows(0, 5), clock)
    assert(t.readChanges(1L, 1L).count() == 0)
    intercept[IllegalArgumentException](t.readChanges(1L, 9L))
  }

  test("copy-on-write DELETE (and truncate) emits the deleted rows") {
    // CoW deleteWhere is a replacement commit: survivors are REWRITTEN
    // into new files. The changelog recovers the net changes by multiset
    // diff of removed-vs-added files — rewritten survivors cancel, the
    // deleted rows remain as delete events, and no spurious inserts leak.
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc4") + "/t", schema)
    t.append(rows(0, 10).repartition(2), clock)
    t.deleteWhere($"id" < 3, clock) // s2: CoW replacement, op cow_delete
    t.append(rows(10, 12), clock)   // s3
    val ch = t.readChanges(0L, 3L)
    val byCommit = ch.groupBy($"_commit_snapshot_id", $"_change_type")
      .count().as[(Long, String, Long)].collect().toSet
    assert(byCommit == Set(
      (1L, "insert", 10L), (2L, "delete", 3L), (3L, "insert", 2L)))
    assert(ch.filter($"_change_type" === "delete")
      .select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // the deleted events carry the full pre-delete rows
    assert(ch.filter($"_change_type" === "delete" && $"id" === 2)
      .select("v").as[String].head() == "v2")
    // replaying insert∖delete reconstructs the table
    val replayed = ch.filter($"_change_type" === "insert").select("id")
      .except(ch.filter($"_change_type" === "delete").select("id"))
    assert(replayed.as[Long].collect().sorted.toSeq ==
      t.read.select("id").as[Long].collect().sorted.toSeq)

    // bare truncate (DELETE FROM t) takes the same CoW path: every row
    // out as a delete event
    val t2 = GraftTable.create(spark, tmpDir("cdc5") + "/t", schema)
    t2.append(rows(0, 5), clock)
    t2.deleteWhere(lit(true), clock)
    t2.append(rows(5, 8), clock)
    val ch2 = t2.readChanges(0L, 3L)
    assert(ch2.filter($"_change_type" === "delete").count() == 5)
    assert(ch2.filter($"_change_type" === "insert").count() == 8)
  }

  test("copy-on-write MERGE emits net delete+insert pairs, carry-overs cancel") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc7") + "/t", schema)
    t.append(rows(0, 10).repartition(2), clock) // s1
    // replace ids 5-9, insert 10-12, and "update" id 0 to its IDENTICAL
    // current row — a no-op update must produce no events (net semantics)
    val src = spark.range(5, 13)
      .select($"id", concat(lit("UP"), $"id").as("v"))
      .unionByName(Seq((0L, "v0")).toDF("id", "v"))
    t.merge(src, Seq("id"), clock)              // s2: CoW replacement
    val ch = t.readChanges(1L, 2L)
    val dels = ch.filter($"_change_type" === "delete")
    val ins = ch.filter($"_change_type" === "insert")
    // deletes: the OLD rows of replaced keys 5-9 (id 0 cancelled)
    assert(dels.select("id").as[Long].collect().sorted.toSeq ==
      Seq(5L, 6L, 7L, 8L, 9L))
    assert(dels.filter($"id" === 5).select("v").as[String].head() == "v5")
    // inserts: the NEW rows of keys 5-12 (id 0 cancelled, 0-4 carried)
    assert(ins.select("id").as[Long].collect().sorted.toSeq ==
      (5L to 12L).toSeq)
    assert(ins.filter($"id" === 5).select("v").as[String].head() == "UP5")
  }

  test("copy-on-write UPDATE emits net delete+insert pairs") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc10") + "/t", schema)
    t.append(rows(0, 6).repartition(2), clock)       // s1
    assert(t.updateWhere($"id" < 2,
      Map("v" -> concat($"v", lit("!"))), clock) == 2) // s2
    val ch = t.readChanges(1L, 2L)
    val dels = ch.filter($"_change_type" === "delete")
      .select("id", "v").as[(Long, String)].collect().sorted.toSeq
    val ins = ch.filter($"_change_type" === "insert")
      .select("id", "v").as[(Long, String)].collect().sorted.toSeq
    assert(dels == Seq((0L, "v0"), (1L, "v1")), "old rows out")
    assert(ins == Seq((0L, "v0!"), (1L, "v1!")), "new rows in")
  }

  test("CoW net diff aligns files written before schema evolution") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc11") + "/t", schema)
    t.append(rows(0, 6), clock)         // s1: old-generation files
    t.renameColumn("v", "label")
    t.addColumn("score", DoubleType)
    t.deleteWhere($"id" < 2, clock)     // s2: CoW over old files
    val ch = t.readChanges(1L, 2L)
    assert(ch.columns.toSeq ==
      Seq("id", "label", "score", "_change_type", "_commit_snapshot_id"))
    val dels = ch.filter($"_change_type" === "delete")
    assert(dels.select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
    // renamed column resolves through field ids; added column reads NULL
    assert(dels.select("label").as[String].collect().sorted.toSeq ==
      Seq("v0", "v1"))
    assert(dels.filter($"score".isNull).count() == 2)
  }

  test("net diff is multiset-exact on duplicate rows") {
    val clock = new TestClock
    val t = GraftTable.create(spark, tmpDir("cdc8") + "/t", schema)
    t.append(Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v"), clock)
    t.deleteWhere($"id" === 1, clock)
    val ch = t.readChanges(1L, 2L)
    // BOTH identical copies deleted → exactly two delete events
    assert(ch.filter($"_change_type" === "delete").count() == 2)
    assert(ch.filter($"_change_type" === "insert").count() == 0)
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
