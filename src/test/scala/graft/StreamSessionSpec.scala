package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The stream-conf isolation invariant (successor to the scoped-conf
  * window + RelCacheGuardSpec): streaming entries carry their scoped
  * confs — 8 shuffle partitions, RocksDB state store — on per-start
  * CLONED sessions and never mutate the shared session conf, so a
  * concurrently materialized batch plan (RelCache) can never capture
  * the stream-scoped values. These tests pin both halves: the clone
  * really captures the scoped confs (observable in the checkpoint's
  * state layout), and the shared conf is untouched at every instant of
  * a streaming entry's run. */
class StreamSessionSpec extends graft.SparkSpec {

  test("streamClone carries scoped confs; shared session untouched") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cs = StreamOps.streamClone(spark)
    assert(cs.conf.get("spark.sql.shuffle.partitions") === "8")
    assert(cs.conf.get("spark.sql.streaming.stateStore.providerClass") ===
      StreamOps.RocksDbProvider)
    // runtime confs set on the shared session carry into the clone
    assert(cs.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    // ... and the shared session keeps its resting values
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
    // the shared session keeps the DEFAULT provider (getOption reports
    // registered-conf defaults, so compare against RocksDB directly)
    assert(spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .forall(_ != StreamOps.RocksDbProvider))
  }

  test("a clone-bound stateful stream captures 8 state partitions and RocksDB") {
    val cs = StreamOps.streamClone(spark)
    implicit val sq = cs.sqlContext
    val ms = MemoryStream[Int](
      org.apache.spark.sql.Encoders.scalaInt, sq)
    ms.addData(1 to 100: _*)
    val ckpt = tmpDir("stream_session_ckpt")
    val sink = s"ss_spec_${System.nanoTime()}"
    val q = StreamOps.onSession(cs,
      ms.toDF().groupBy((col("value") % 5).as("k")).count())
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    // one state-store dir per shuffle partition of the CLONE (8), not
    // of the shared session (4)
    val stateParts = new java.io.File(s"$ckpt/state/0")
      .listFiles().count(f => f.isDirectory && f.getName.forall(_.isDigit))
    assert(stateParts === 8)
    // RocksDB provider: its per-partition dirs carry changelog/zip
    // artifacts the HDFS provider never writes
    val files = java.nio.file.Files.walk(
        java.nio.file.Paths.get(ckpt, "state")).toArray.map(_.toString)
    assert(files.exists(f => f.endsWith(".changelog") || f.endsWith(".zip")),
      "expected RocksDB state artifacts under the checkpoint")
    cs.catalog.dropTempView(sink)
  }

  test("shared conf is stable at every instant of a streaming entry run") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    @volatile var on = true
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val poller = new Thread(() => {
      while (on) {
        seen.add(spark.conf.get("spark.sql.shuffle.partitions"))
        Thread.sleep(1)
      }
    })
    poller.setDaemon(true); poller.start()
    try {
      assert(StreamOps.st05GraftSource(spark, sfDir).count() > 0)
    } finally { on = false; poller.join() }
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet === Set("4"),
      s"shared shuffle-partitions conf moved during a stream run: $seen")
  }
}
