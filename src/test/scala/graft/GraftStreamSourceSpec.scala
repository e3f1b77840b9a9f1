package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** The graft table as a streaming SOURCE: snapshot ids are offsets,
  * micro-batches are incremental append scans, checkpoints resume
  * exactly where the last run stopped. */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType)))
  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id".as("k"))

  /** Drain everything currently available through a checkpointed
    * foreachBatch run (the memory sink cannot recover a checkpoint). */
  private def runOnce(loc: String, ckpt: String): Seq[Long] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((df: DataFrame, _: Long) =>
        df.collect().foreach((r: Row) => got.add(r.getLong(0))))
      .start()
    q.processAllAvailable(); q.stop()
    got.asScala.toSeq.sorted
  }

  test("snapshots stream as micro-batches; checkpoint resumes at the delta") {
    val loc = tmpDir("gstream") + "/t"
    val ckpt = tmpDir("gstreamck")
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 10))
    t.append(batch(10, 30))
    assert(runOnce(loc, ckpt) == (0L until 30L))

    // appends land while no query runs; the resumed query reads ONLY them
    t.append(batch(30, 35))
    t.append(batch(35, 40))
    assert(runOnce(loc, ckpt) == (30L until 40L),
      "resume must deliver exactly the unconsumed appends")
    // nothing new → empty drain
    assert(runOnce(loc, ckpt).isEmpty)
  }

  test("startingSnapshotId skips already-processed history") {
    val loc = tmpDir("gstream") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 10))  // snapshot 1
    t.append(batch(10, 15)) // snapshot 2
    val q = spark.readStream.format("graft")
      .option("startingSnapshotId", "1").load(loc)
      .writeStream.format("memory").queryName("gs3")
      .option("checkpointLocation", tmpDir("gstreamck")).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("gs3").as[Long].collect().sorted.toSeq == (10L until 15L))
  }

  test("maxSnapshotsPerTrigger paces backlog draining into bounded batches") {
    val loc = tmpDir("gstream") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 10))  // snapshot 1
    t.append(batch(10, 30)) // snapshot 2
    t.append(batch(30, 35)) // snapshot 3
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val q = spark.readStream.format("graft")
      .option("maxSnapshotsPerTrigger", "1").load(loc)
      .writeStream.option("checkpointLocation", tmpDir("gstreamck"))
      .foreachBatch((df: DataFrame, _: Long) => { sizes.add(df.count()); () })
      .start()
    q.processAllAvailable(); q.stop()
    // one snapshot per micro-batch, in commit order
    assert(sizes.asScala.toSeq == Seq(10L, 20L, 5L))
  }

  test("maxFilesPerTrigger caps batch size but never splits a snapshot") {
    val loc = tmpDir("gstream") + "/t"
    val ckpt = tmpDir("gstreamck")
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 8).repartition(4))   // snapshot 1: 4 files
    t.append(batch(8, 10).repartition(2))  // snapshot 2: 2 files
    t.append(batch(10, 12).repartition(2)) // snapshot 3: 2 files
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "4").load(loc)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: DataFrame, _: Long) => { sizes.add(df.count()); () })
        .start()
      q.processAllAvailable(); q.stop()
    }
    drain()
    // snapshot 1 fills the 4-file budget alone; 2 and 3 fit together
    assert(sizes.asScala.toSeq == Seq(8L, 4L))

    // pacing survives a checkpoint restart (getBatch re-primes the base)
    sizes.clear()
    t.append(batch(12, 20).repartition(8)) // snapshot 4: 8 files > cap
    t.append(batch(20, 22).repartition(2)) // snapshot 5
    drain()
    // oversized snapshot 4 still ships whole (bounded progress), alone
    assert(sizes.asScala.toSeq == Seq(8L, 2L))
  }

  test("readChangeFeed streams inserts AND merge-on-read delete events") {
    val loc = tmpDir("gstream") + "/t"
    val ckpt = tmpDir("gstreamck")
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 10))
    t.deleteWhereMOR(col("k") < 3)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(loc)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: DataFrame, _: Long) =>
          df.collect().foreach((r: Row) =>
            got.add((r.getLong(0), r.getString(1), r.getLong(2)))))
        .start()
      q.processAllAvailable(); q.stop()
    }
    drain()
    val events = got.asScala.toSeq
    assert(events.count(_._2 == "insert") == 10)
    assert(events.filter(_._2 == "delete").map(_._1).sorted == Seq(0L, 1L, 2L))
    // checkpoint resume: an upsert streams as delete+insert
    got.clear()
    t.upsert(batch(5, 6), Seq("k"))
    drain()
    val resumed = got.asScala.toSeq
    assert(resumed.map(e => (e._1, e._2)).sorted ==
      Seq((5L, "delete"), (5L, "insert")))
  }

  test("a nightly optimize is transparent to a caught-up stream") {
    val loc = tmpDir("gstream") + "/t"
    val ckpt = tmpDir("gstreamck")
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 10).coalesce(1))
    t.append(batch(10, 20).coalesce(1))
    assert(runOnce(loc, ckpt) == (0L until 20L))

    // the stream consumed everything the compaction rewrites — it must
    // read straight through the maintenance commit and deliver exactly
    // the post-compaction append
    t.optimize()
    t.append(batch(20, 25))
    assert(runOnce(loc, ckpt) == (20L until 25L),
      "a caught-up stream must survive optimize")
  }

  test("a compaction burying an unconsumed append fails the stream loudly") {
    val loc = tmpDir("gstream") + "/t"
    val ckpt = tmpDir("gstreamck")
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 10).coalesce(1))
    assert(runOnce(loc, ckpt) == (0L until 10L))

    t.append(batch(10, 20).coalesce(1)) // unconsumed
    t.optimize() // folds the unconsumed rows into compaction-stamped files
    val e = intercept[Exception] { runOnce(loc, ckpt) }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage)
        .exists(_.contains("cannot cross compaction")) || mentions(t.getCause))
    assert(mentions(e), s"expected the lost-lineage refusal, got: $e")
  }

  test("a snapshot cap above Int.MaxValue clamps instead of overflowing") {
    val loc = tmpDir("gstream") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(batch(0, 3))
    t.append(batch(3, 6))
    // 3e9.toInt is negative — an unclamped take() would return an empty
    // list and .last would throw; the admission window must instead
    // admit everything pending
    val src = new org.apache.spark.sql.graft.GraftStreamSource(
      spark.sqlContext, loc, -1L, Some(3000000000L), None)
    val off = src.getOffset
    assert(off.map(_.json).contains("2"), s"expected head offset 2, got $off")
  }
}
