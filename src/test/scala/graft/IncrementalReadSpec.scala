package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** Incremental append scans and rollback — the checkpoint-consumer and
  * oops-recovery ops of an incremental pipeline over the table format. */
class IncrementalReadSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType)))

  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id".as("k"))

  test("incremental scan returns exactly the rows added in the range") {
    val t = GraftTable.create(spark, tmpDir("inc") + "/t", schema)
    t.append(batch(0, 10))    // snapshot 1
    t.append(batch(10, 30))   // snapshot 2
    t.append(batch(30, 60))   // snapshot 3
    def ks(lo: Long, hi: Long) =
      t.readIncremental(lo, hi).as[Long].collect().sorted.toSeq
    assert(ks(0, 1) == (0L until 10L))
    assert(ks(1, 3) == (10L until 60L))
    assert(ks(1, 2) == (10L until 30L))
    assert(t.readIncremental(3, 3).count() == 0) // empty range
    intercept[IllegalArgumentException](t.readIncremental(1, 99))
    intercept[IllegalArgumentException](t.readIncremental(2, 1))
  }

  test("compactions are transparent to a caught-up consumer, refused otherwise") {
    val t = GraftTable.create(spark, tmpDir("inc") + "/t", schema)
    t.append(batch(0, 10).coalesce(1))  // snapshot 1
    t.append(batch(10, 20).coalesce(1)) // snapshot 2
    t.optimize()                        // snapshot 3 rewrites files
    // snapshot 2's rows were folded into compaction-stamped files — an
    // unconsumed append crossing the compaction is unrecoverable
    val e = intercept[IllegalArgumentException](t.readIncremental(1, 3))
    assert(e.getMessage.contains("cannot cross compaction"))
    // a caught-up consumer (checkpoint ≥ every pre-compaction append)
    // reads straight through the nightly optimize: zero new rows at the
    // compaction itself, later appends delivered exactly
    assert(t.readIncremental(2, 3).count() == 0)
    t.append(batch(20, 25)) // snapshot 4
    assert(t.readIncremental(2, 4).as[Long].collect().sorted.toSeq ==
      (20L until 25L))
    assert(t.readIncremental(3, 4).as[Long].collect().sorted.toSeq ==
      (20L until 25L))
    // a genuine replacement (overwrite) is still refused loudly
    t.overwrite(batch(30, 35))          // snapshot 5
    val e2 = intercept[IllegalArgumentException](t.readIncremental(4, 5))
    assert(e2.getMessage.contains("append-only"))
  }

  test("rollback: one atomic ref move; next commit chains from there") {
    val t = GraftTable.create(spark, tmpDir("inc") + "/t", schema)
    t.append(batch(0, 10))  // snapshot 1
    t.append(batch(10, 20)) // snapshot 2
    t.append(batch(20, 30)) // snapshot 3
    t.rollback(2L)
    assert(t.read.count() == 20, "main serves the rolled-back state")
    assert(t.rowCount == 20, "log totals follow the ref")
    assert(t.readAsOf(3L).count() == 30, "later snapshot readable by id")
    intercept[IllegalArgumentException](t.rollback(99L))
    // the next commit chains onto the rolled-back head, not snapshot 3
    t.append(batch(100, 105)) // snapshot 4, parent 2
    assert(t.read.as[Long].collect().sorted.toSeq ==
      ((0L until 20L) ++ (100L until 105L)))
    assert(t.snapshots.maxBy(_.snapshotId).parentId == 2L)
    assert(t.branches("main") == 4L)
  }
}
