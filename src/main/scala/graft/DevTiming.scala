package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: repeated-run timing to separate warm-up from steady
  * state and expose erratic-timing causes. */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
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
    val mx = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs = { var t = 0L; mx.forEach(b => t += b.getCollectionTime); t }
    for (round <- 1 to 6) {
      names.foreach { name =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[$round] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  gc=${gcMs - g0}%5d ms")
      }
    }
    spark.stop()
  }
}
