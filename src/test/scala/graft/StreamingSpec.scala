package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Ev, SessionOut}

/** Stateful-streaming semantics under controlled micro-batches: the
  * watermark decides when gap-based sessions close, and late-but-inside-
  * the-delay events still join their session. */
class StreamingSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, v: Double) =
    Ev(id, java.sql.Timestamp.from(Instant.parse(t + "Z")), user, "click", v)

  test("sessionize closes sessions via event-time watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Ev]
    val sessions = StreamOps.sessionize(input.toDS(), gapMinutes = 30,
      watermarkDelay = "5 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 has two events 10 min apart (one session);
      // user 2 one event.
      input.addData(
        ev(1, "2026-01-01T10:00:00", 1, 1.0),
        ev(2, "2026-01-01T10:10:00", 1, 2.0),
        ev(3, "2026-01-01T10:00:00", 2, 5.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // nothing closed yet

      // batch 2: an event far in the future pushes the watermark past
      // both users' gap deadlines -> their sessions time out and emit.
      input.addData(ev(4, "2026-01-01T13:00:00", 3, 1.0))
      q.processAllAvailable()
      // one more batch so timeouts registered against the new watermark fire
      input.addData(ev(5, "2026-01-01T13:00:01", 3, 1.0))
      q.processAllAvailable()

      val out = spark.table("sessions_out").as[SessionOut]
        .collect().sortBy(_.user_id)
      assert(out.map(_.user_id).toSeq == Seq(1L, 2L))
      val u1 = out(0)
      assert(u1.session_start == "2026-01-01 10:00:00")
      assert(u1.session_end == "2026-01-01 10:10:00")
      assert(u1.n_events == 2 && u1.total_value == 3.0)
    } finally q.stop()
  }

  test("in-batch gap splits one user's events into two sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Ev]
    val sessions = StreamOps.sessionize(input.toDS(), gapMinutes = 30,
      watermarkDelay = "5 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_split").outputMode(OutputMode.Append()).start()
    try {
      // 3 events, the third >30 min after the second: session boundary
      // inside a single micro-batch -> the first session emits directly.
      input.addData(
        ev(1, "2026-01-01T10:00:00", 7, 1.0),
        ev(2, "2026-01-01T10:05:00", 7, 1.0),
        ev(3, "2026-01-01T12:00:00", 7, 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions_split").as[SessionOut].collect()
      assert(out.length == 1)
      assert(out(0).session_start == "2026-01-01 10:00:00")
      assert(out(0).session_end == "2026-01-01 10:05:00")
      assert(out(0).n_events == 2)
    } finally q.stop()
  }

  test("streaming hourly counts equal the batch aggregation") {
    val streamed = StreamOps.st01HourlyStream(spark, "/root/testdata/sf0.001")
      .collect()
    val batch = graft.rel.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
      .collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.getLong(2)).sum == batch.map(_.getLong(2)).sum)
    assert(streamed.length == batch.length)
  }

  /** Delete a landed-stream generation (landViaCheckpoint's dirs) so a
    * test can observe a FRESH stream pass — the persistent generations
    * make ordinary re-runs incremental no-ops with zero micro-batches,
    * which defeats listeners that inspect per-batch progress. Safe
    * here: suites run sequentially in one JVM and no concurrent reader
    * holds the generation. */
  private def clearGenerations(tag: String, dir: String): Unit = {
    val key = graft.Fixtures.key8(dir)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        f.getName.startsWith(s"graft_${tag}_${key}_"))
      .foreach { g =>
        // under the generation's cross-process lock: a bench JVM
        // running beside the suite must never have the checkpoint
        // deleted out from under its in-flight stream
        graft.Fixtures.withFileLock(g.getName) {
          val p = new org.apache.hadoop.fs.Path(g.toString)
          p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        }
      }
  }

  test("st04 matched slice of the shared outer pass equals a dedicated batch inner join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamOps.queries("st04_stream_join")(spark, sf).collect()
    assert(streamed.nonEmpty)
    val ev = graft.rel.Tables.load(spark, sf, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val batch = c.join(p, expr("""c_user = p_user AND
        p_ts >= click_ts AND p_ts <= click_ts + interval 1 hour"""))
      .groupBy((col("c_user") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks_matched"))
      .orderBy("bucket")
      .collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      "outer-join matched rows (emitted on probe) must equal the " +
        "dedicated inner join — st04's oracle contract")
  }

  test("st04/st12 shared landed pass is incremental: a re-run commits no new snapshots") {
    val sf = "/root/testdata/sf0.001"
    val first = StreamOps.queries("st12_outer_join")(spark, sf).collect()
    val key = graft.Fixtures.key8(sf)
    val gens = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith(s"graft_st0412b_${key}_"))
    assert(gens.nonEmpty, "the landed generation dir must exist after a run")
    def snapCounts = gens.toSeq.map(g =>
      graft.meta.GraftTable.load(spark, s"$g/landed").snapshots.size)
    val before = snapCounts
    val again = StreamOps.queries("st12_outer_join")(spark, sf).collect()
    assert(snapCounts == before,
      "the second consumer's re-run must be an incremental no-op " +
        "(persistent checkpoint + batch markers), not a fresh stream pass")
    assert(again.map(_.toString).toSeq == first.map(_.toString).toSeq)
  }

  test("st12 outer join emits null-padded rows on eviction, matching the batch left join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamOps.queries("st12_outer_join")(spark, sf).collect()
    assert(streamed.nonEmpty)
    // the eviction path genuinely fired: unmatched clicks dominate the
    // demo corpus — a zero here means outer state never flushed
    val unmatched = streamed.map(r =>
      r.getLong(r.fieldIndex("n_unmatched"))).sum
    assert(unmatched > 0, "no null-padded outer rows were emitted")
    // batch twin under the same declared cutoff (anchored on the
    // join's final watermark: least over both legs' max event times)
    val ev = graft.rel.Tables.load(spark, sf, "events")
    val mx = ev.agg(least(
      max(when(col("event_type") === "click", col("ts"))),
      max(when(col("event_type") === "purchase", col("ts")))).as("max_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val batch = c.join(p, expr("""c_user = p_user AND
        p_ts >= click_ts AND p_ts <= click_ts + interval 1 hour"""),
        "left_outer")
      .crossJoin(broadcast(mx))
      .filter(col("click_ts") <= col("max_ts") -
        expr(s"interval ${StreamOps.OuterCutoffHours} hours"))
      .groupBy((col("c_user") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("click_id")).as("n_clicks"),
        countDistinct(when(col("p_id").isNotNull, col("click_id")))
          .as("n_matched"),
        countDistinct(when(col("p_id").isNull, col("click_id")))
          .as("n_unmatched"))
      .orderBy("bucket")
      .collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
      "streamed outer-join aggregate must equal the batch left join " +
        "under the same cutoff")
  }

  test("stateful starts run on the RocksDB state store; session conf restored") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val metricKeys = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach(
          _.customMetrics.keySet().forEach(k => metricKeys.add(k)))
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.get(provKey)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    // clone-bound queries report to the clone's StreamingQueryManager
    StreamOps.onStreamClone = cs => cs.streams.addListener(listener)
    try {
      // a fresh generation: the listener must see a real stateful pass,
      // not the incremental no-op a landed generation serves
      clearGenerations("st02", "/root/testdata/sf0.001")
      StreamOps.queries("st02_stream_dedup")(spark, "/root/testdata/sf0.001")
        .collect()
      // the listener bus is async — give progress events a moment
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!metricKeys.stream().anyMatch(_.toLowerCase.contains("rocksdb"))
        && System.nanoTime() < deadline) Thread.sleep(100)
      assert(metricKeys.stream()
        .anyMatch(_.toLowerCase.contains("rocksdb")),
        s"expected RocksDB state-store metrics in query progress; " +
          s"saw: ${metricKeys.toArray.mkString(", ")}")
      assert(spark.conf.get(provKey) == prevProv,
        "shared-session provider conf must be untouched by a stream start")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == prevParts,
        "shared-session shuffle-partition conf must be untouched")
    } finally StreamOps.onStreamClone = _ => ()
  }

  test("st08 is stateless end-to-end — no state operator in any micro-batch") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val stateOps = new java.util.concurrent.atomic.AtomicLong(0)
    val sawProgress = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
        sawProgress.incrementAndGet()
        stateOps.addAndGet(e.progress.stateOperators.length.toLong)
      }
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    StreamOps.onStreamClone = cs => cs.streams.addListener(listener)
    try {
      // fresh generation — the stateless claim is about the real pass
      clearGenerations("st08", "/root/testdata/sf0.001")
      StreamOps.queries("st08_stream_decontaminate")(
        spark, "/root/testdata/sf0.001").collect()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (sawProgress.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(sawProgress.get() > 0, "expected at least one progress event")
      // within-document shingle dedup is array_distinct, a projection:
      // a streaming dropDuplicates here would hold distinct (doc,
      // shingle) state — corpus-scale, unbounded, no watermark evicts it
      assert(stateOps.get() == 0L,
        s"st08 must run with ZERO stateful operators; saw ${stateOps.get()}")
    } finally StreamOps.onStreamClone = _ => ()
  }
}
