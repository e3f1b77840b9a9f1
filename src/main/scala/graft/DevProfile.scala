package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time one SparkEntry query repeatedly (min-of-n, like Bench). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    if (name == "x12_stages") { profileUpsertStages(spark, sfDir, n); spark.stop(); return }
    // poor-man's sampling profiler for the DRIVER thread: aggregate the
    // deepest graft/spark frame every 20 ms while the entry runs
    if (sys.env.contains("SPARK_GRAFT_SAMPLE")) {
      val fn0 = SparkEntry.queries(name)
      fn0(spark, sfDir).count() // warm
      val main = Thread.currentThread()
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
      @volatile var on = true
      val sampler = new Thread(() => {
        while (on) {
          val st = main.getStackTrace
          // topmost interesting frame + the deepest graft frame
          val top = st.headOption.map(f =>
            s"${f.getClassName.split('.').last}.${f.getMethodName}").getOrElse("?")
          val g = st.find(_.getClassName.startsWith("graft")).map(f =>
            s"${f.getClassName.split('.').last}.${f.getMethodName}:${f.getLineNumber}")
            .getOrElse("-")
          counts.merge(s"$top | $g", 1, Integer.sum(_, _))
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true); sampler.start()
      (0 until n).foreach(_ => fn0(spark, sfDir).count())
      on = false; sampler.join()
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, c) =>
        println(f"[devsample] $c%4d $k")
      }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    val times = (0 until (n + 1)).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[devprofile] $name pass $i: $s%.2f s")
      s
    }
    println(f"[devprofile] $name min-of-$n (excl warmup): ${times.tail.min}%.2f s")
    spark.stop()
  }

  /** Stage-by-stage timing of the x12 upsert demo body. */
  private def profileUpsertStages(spark: SparkSession, sfDir: String, n: Int): Unit = {
    import org.apache.spark.sql.functions._
    import graft.meta.GraftTable
    import java.time.{Clock, Instant, ZoneOffset}
    val t0c = Clock.fixed(Instant.ofEpochSecond(20000L * 86400), ZoneOffset.UTC)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val verbose = sys.env.contains("SPARK_GRAFT_JOBSITES")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (verbose)
            println(s"[devjob] ${e.stageInfos.map(_.name).distinct.mkString(" / ")}")
        }
      })
    def time[A](tag: String)(f: => A): A = {
      val h0 = GraftTable.footerInventoryHits.get()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val dh = GraftTable.footerInventoryHits.get() - h0
      println(f"[devprofile]   $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" (footer hits +$dh, jobs +${jobs.get() - j0})")
      r
    }
    (0 until n).foreach { i =>
      println(s"[devprofile] x12 stages pass $i")
      val seed = spark.read.parquet(s"$sfDir/part.parquet")
      val loc = java.nio.file.Files.createTempDirectory("graft_prof")
        .resolve("t").toString
      val t = time("create")(GraftTable.create(spark, loc, seed.schema))
      time("append")(t.append(seed, t0c))
      val src = seed.filter(col("p_partkey") % 9 === 0)
        .withColumn("p_retailprice", col("p_retailprice") + 1000.0)
      time("upsert")(t.upsert(src, Seq("p_partkey"), t0c))
      time("read_count")(t.read.filter(col("p_partkey") % 9 === 0).count())
      time("optimize")(t.optimize(clock = t0c))
      time("rowCount")(t.rowCount)
    }
  }
}
