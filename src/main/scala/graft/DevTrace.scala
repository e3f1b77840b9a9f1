package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: single cold query with INFO logs to locate warm-up stalls. */
object DevTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = if (args.length > 1) args(1) else "q05_local_supplier_volume"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // int64-micros timestamps (Iceberg's mandated encoding): footer
      // stats exist, unlike deprecated INT96 — enables the footer-
      // inventory commit fast path (GraftTable.footerInventory)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    println(f"COLD $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
