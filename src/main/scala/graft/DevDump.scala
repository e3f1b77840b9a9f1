package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the full result of named SparkEntry queries at a
  * given sf dir — used to author/debug oracle SQL for entries whose
  * outputs summarize engine state (the x-family). Not a driver main. */
object DevDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries.filter(kv => names.isEmpty || names.contains(kv._1))
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"===== $name =====")
      try {
        val df = fn(spark, sfDir)
        df.printSchema()
        df.show(100, truncate = false)
      } catch { case e: Throwable =>
        println(s"ERROR: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
