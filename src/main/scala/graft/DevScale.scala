package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: synthesize an N-times documents/embeddings corpus from a
  * base sf dir (deterministic near-dup copies, so the dedup family has
  * N-member clusters to find) and run the heaviest [EXT] operators once,
  * recording per-query wall time, total shuffle read/write bytes, and
  * the LARGEST single task-result shipped to the driver (the "does any
  * stage collect data rows driver-side?" signal — data-plane operators
  * must ship only bounded summaries).
  *
  * Usage: DevScale <baseSfDir> <multiplier> [queries...]
  * Prints one JSON line per query; not a driver main.
  */
object DevScale {
  private final class Metrics extends SparkListener {
    val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder
    @volatile var maxTaskResult: Long = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        val r = m.resultSize
        synchronized { if (r > maxTaskResult) maxTaskResult = r }
      }
    }
    def reset(): Unit = { shuffleRead.reset(); shuffleWrite.reset()
      synchronized { maxTaskResult = 0L } }
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(20)
    val names = args.drop(2).toSeq match {
      case Nil => Seq("d03_minhash_lsh", "d09_dedup_clusters",
        "d11_incremental_dedup", "d13_kmeans_topics", "s05_lsh_neardup",
        "m04_perceptual_neardup")
      case xs => xs
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- synthesize the xN corpus --------------------------------------
    val dir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val copies = explode(sequence(lit(0), lit(mult - 1))).as("c")
    // near-dup copies: a one-token suffix keeps shingle overlap high, so
    // every base doc becomes an N-member near-dup cluster
    spark.read.parquet(s"$base/documents.parquet")
      .select(col("*"), copies)
      .select(
        (col("doc_id") + col("c").cast("long") * 10000000L).as("doc_id"),
        when(col("c") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copyv"), col("c"))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("*"), copies)
      .select(
        (col("vec_id") + col("c").cast("long") * 10000000L).as("vec_id"),
        col("label"),
        // tiny deterministic perturbation on one dimension per copy:
        // cosine to the base vector stays ~1 → s05 finds the clusters
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("c"), size(col("embedding"))),
            x + lit(0.01f) * col("c").cast("float")).otherwise(x))
          .as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // part/orders synthesis only when a requested query reads them;
    // events synthesize for ANY non-default probe list (a hand-kept
    // per-query needs-events set kept silently missing entries — one
    // extra write job is cheaper than a probe that errors on a missing
    // events.parquet). The default documents/embeddings list skips it.
    val defaultNames = Set("d03_minhash_lsh", "d09_dedup_clusters",
      "d11_incremental_dedup", "d13_kmeans_topics", "s05_lsh_neardup",
      "m04_perceptual_neardup")
    val partQueries = Set("d16_fuzzy_join", "q45_recursive_cte")
    // orders: copies get fresh customers — the change-feed corpus grows
    // xN while PER-CUSTOMER version-chain depth stays constant, the
    // regime q49's "one window over one key exchange" claim lives in
    val orderQueries = Set("q49_scd2")
    if (names.exists(orderQueries)) {
      // the copy strides must clear the real key ranges or copies would
      // silently alias into base keys (TPC-H orderkeys pass 1e8 around
      // sf>=17) and corrupt the synthesized distribution
      val mx = spark.read.parquet(s"$base/orders.parquet")
        .agg(max(col("o_orderkey")), max(col("o_custkey"))).collect()(0)
      // an empty orders table yields NULL maxes — keep the failure
      // message diagnostic instead of dying on the dereference
      require(!mx.isNullAt(0) && !mx.isNullAt(1),
        s"orders.parquet at $base is empty — cannot derive copy strides")
      require(mx.getAs[Number](0).longValue < 100000000L &&
        mx.getAs[Number](1).longValue < 10000000L,
        s"order key ranges exceed the copy strides: $mx")
      spark.read.parquet(s"$base/orders.parquet")
        .select(col("*"), copies)
        .select(
          (col("o_orderkey") + col("c").cast("long") * 100000000L).as("o_orderkey"),
          (col("o_custkey") + col("c").cast("long") * 10000000L).as("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }
    // events: copies get fresh users (user_id offset per copy), so the
    // corpus grows xN while PER-USER event density stays constant — the
    // exact regime q43/q47's "pair width is a density constant" claim
    // lives in. Read through Tables.load (NOT raw parquet): the harness
    // has re-encoded events.ts µs→ns before, and only the loader
    // normalizes that.
    val nEvents = if (names.forall(defaultNames)) -1L else {
      graft.rel.Tables.load(spark, base, "events")
        .select(col("*"), copies)
        .select(
          (col("event_id") + col("c").cast("long") * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + col("c").cast("long") * 100000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      spark.read.parquet(s"$dir/events.parquet").count()
    }
    // part: fresh keys, SAME names — the row corpus grows xN while the
    // distinct name domain is constant, the regime d16/q45's
    // "resolution runs on the value domain" claim lives in
    if (names.exists(partQueries)) {
      spark.read.parquet(s"$base/part.parquet")
        .select(col("*"), copies)
        .select(
          (col("p_partkey") + col("c").cast("long") * 10000000L).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
    }
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(s"""{"corpus":"x$mult","docs":$nDocs,"vecs":$nVecs,"events":$nEvents,"dir":"$dir"}""")

    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)
    names.foreach { name =>
      metrics.reset()
      val t0 = System.nanoTime()
      // queryExecution.toRdd.count(), NOT Dataset.count(): the Dataset
      // count is rewritten by Catalyst to prune computation the row
      // count doesn't depend on (d17's window, d18's verify join),
      // under-reporting shuffle bytes for the plan actually being
      // graded. Counting the PHYSICAL plan's RDD runs that plan as
      // planned — and keeps driver memory bounded where a collect()
      // would not (d06 returns 12.5% of the corpus, s05 ~N²/2 pairs
      // per synthesized clone cluster).
      val rows = try SparkEntry.queries(name)(spark, dir)
        .queryExecution.toRdd.count()
        catch { case e: Throwable => println(s"""{"query":"$name","error":"${e.getClass.getSimpleName}"}"""); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      def mb(b: Long) = math.round(b / 1048.576) / 1000.0
      println(s"""{"query":"$name","mult":$mult,"rows":$rows,"sec":${math.round(sec * 100) / 100.0},"shuffle_write_mb":${mb(metrics.shuffleWrite.sum)},"shuffle_read_mb":${mb(metrics.shuffleRead.sum)},"max_task_result_mb":${mb(metrics.maxTaskResult)}}""")
    }
    spark.stop()
  }
}
