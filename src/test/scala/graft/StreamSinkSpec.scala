package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.meta.GraftTable
import graft.streaming.GraftSink

/** Exactly-once streaming sink: replayed micro-batches are no-ops,
  * committed atomically with the data via the snapshot-log op tag. */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch stream lands every row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val t = GraftTable.create(spark, tmpDir("sink") + "/t",
      mem.toDF().toDF("id", "tag").schema)
    val fn: (DataFrame, Long) => Unit = GraftSink.appendBatch(t, "q1")
    val q = mem.toDF().toDF("id", "tag").writeStream.foreachBatch(fn).start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(t.read.count() == 3)
    assert(GraftSink.lastBatch(t, "q1").contains(1L))
  }

  test("replayed batch id is ignored; later ids append; per-query isolation") {
    val t = GraftTable.create(spark, tmpDir("sink") + "/t",
      Seq((0L, "x")).toDF("id", "tag").schema)
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    GraftSink.appendBatch(t, "q1")(batch, 0L)
    GraftSink.appendBatch(t, "q1")(batch, 0L) // replay — must be a no-op
    assert(t.read.count() == 2)
    GraftSink.appendBatch(t, "q1")(batch, 1L) // next batch appends
    assert(t.read.count() == 4)
    // a DIFFERENT query writing to the same table has its own ledger
    GraftSink.appendBatch(t, "q2")(batch, 0L)
    assert(t.read.count() == 6)
    assert(GraftSink.lastBatch(t, "q1").contains(1L))
    assert(GraftSink.lastBatch(t, "q2").contains(0L))
  }

  test("streaming WAP: batches stage on a branch, publish is one ref move") {
    val t = GraftTable.create(spark, tmpDir("sink") + "/t",
      Seq((0L, "x")).toDF("id", "tag").schema)
    t.append(Seq((0L, "base")).toDF("id", "tag"))
    t.createBranch("ingest")
    val sink: (DataFrame, Long) => Unit =
      GraftSink.appendBatch(t, "q", branch = "ingest")
    sink(Seq((1L, "a")).toDF("id", "tag"), 0L)
    sink(Seq((2L, "b")).toDF("id", "tag"), 1L)
    sink(Seq((2L, "b")).toDF("id", "tag"), 1L) // replay → no-op
    assert(t.read.count() == 1, "main unaffected while batches stage")
    assert(t.readBranch("ingest").count() == 3)
    t.fastForward("main", "ingest")
    assert(t.read.count() == 3)
    assert(t.rowCount == 3, "metadata-only count agrees post-publish")
  }

  test("applyLatestBatch: final state independent of batch arrival order") {
    // two overlapping batches: key 1's newest row is in A, key 2's in B
    def batchA = Seq((1L, 5L, "a5"), (2L, 1L, "a1")).toDF("k", "ver", "v")
    def batchB = Seq((1L, 3L, "b3"), (2L, 9L, "b9")).toDF("k", "ver", "v")
    def mk() = GraftTable.create(spark, tmpDir("cdc") + "/t", batchA.schema)
    val inOrder = mk(); val reversed = mk()
    val fwd = GraftSink.applyLatestBatch(inOrder, "q", Seq("k"), Seq("ver")) _
    fwd(batchA, 0L); fwd(batchB, 1L)
    val rev = GraftSink.applyLatestBatch(reversed, "q", Seq("k"), Seq("ver")) _
    rev(batchB, 0L); rev(batchA, 1L) // the LATE batch holds STALE rows
    val want = Set((1L, 5L, "a5"), (2L, 9L, "b9"))
    def state(t: GraftTable) = t.read.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(state(inOrder) == want)
    assert(state(reversed) == want,
      "a stale row delivered late must not overwrite the newer table row")
    // replay of the last batch under the same id: still a no-op
    rev(batchA, 1L)
    assert(state(reversed) == want)
    assert(reversed.snapshots.size == 2)
  }

  test("marker survives restart: a fresh table handle still dedups") {
    val loc = tmpDir("sink") + "/t"
    val t = GraftTable.create(spark, loc, Seq((0L, "x")).toDF("id", "tag").schema)
    val batch = Seq((1L, "a")).toDF("id", "tag")
    GraftSink.appendBatch(t, "q")(batch, 7L)
    val reopened = GraftTable.load(spark, loc) // "restarted" writer
    GraftSink.appendBatch(reopened, "q")(batch, 7L)
    assert(reopened.read.count() == 1)
    assert(GraftSink.lastBatch(reopened, "q").contains(7L))
  }
}
