package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: per-demo min-of-3 wall time at the Bench session shape. */
object DevDemoTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // int64-micros timestamps (Iceberg's mandated encoding): footer
      // stats exist, unlike deprecated INT96 — enables the footer-
      // inventory commit fast path (GraftTable.footerInventory)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq match {
      case Nil => Seq("x05_scheduler", "x10_mor_delete", "x12_upsert")
      case xs => xs
    }
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count()
    }
    // job-level accounting: how much of the wall is Spark jobs vs
    // driver-side gaps (fs metadata, log CAS, footer reads)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobNanos = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (s != 0L) { jobs.incrementAndGet(); jobNanos.addAndGet(System.nanoTime() - s) }
        }
      })
    if (sys.env.contains("SPARK_GRAFT_JOBTRACE")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val site = Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
            t.put(e.jobId, (System.nanoTime(), site))
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val v = t.remove(e.jobId)
            if (v != null) println(
              f"JOB ${e.jobId}%3d ${(System.nanoTime() - v._1) / 1e6}%7.1fms ${v._2}")
          }
        })
    }
    names.foreach { n =>
      val ts = (0 until 3).map { _ =>
        jobs.set(0); jobNanos.set(0L)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, jobs.get, jobNanos.get / 1e9)
      }
      val best = ts.minBy(_._1)
      println(f"DEMOTIME $n min=${best._1}%.2f jobs=${best._2} jobsec=${best._3}%.2f all=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
