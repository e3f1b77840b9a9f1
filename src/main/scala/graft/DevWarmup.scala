package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: ONE cold pass over every registry entry, printing
  * per-entry first-touch seconds — mirrors exactly what Bench's warm-up
  * pass pays (fixture builds + RelCache materializations + first codegen),
  * so the expensive warmup chains can be found and staged.
  */
object DevWarmup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq
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
    val threads = sys.env.getOrElse("SPARK_GRAFT_WARMUP_THREADS", "1").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    names.map { name =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val t1 = System.nanoTime()
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case e: Throwable => println(s"FAIL $name: ${e.getMessage}") }
          println(f"$name%-32s ${(System.nanoTime() - t1) / 1e9}%8.2f s")
        }
      })
    }.foreach(_.get())
    pool.shutdown()
    println(f"TOTAL WARMUP ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    spark.stop()
  }
}
