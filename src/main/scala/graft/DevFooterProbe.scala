package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession

/** Dev probe: does the footer-inventory fast path fire, and does it
  * produce the same manifest stats as the distributed aggregation? */
object DevFooterProbe {
  def main(args: Array[String]): Unit = {
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
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("footerprobe").toString
    val df = Seq(
      (1L, "alpha", 1.5, Timestamp.valueOf("2024-01-01 10:00:00.123456"),
        java.sql.Date.valueOf("2024-01-01"), Some(10)),
      (2L, "omega", -2.75, Timestamp.valueOf("2025-06-30 23:59:59.999999"),
        java.sql.Date.valueOf("2025-12-31"), None),
      (3L, null, 0.0, null, null, Some(-4))
    ).toDF("id", "name", "score", "ts", "d", "opt")
    df.coalesce(1).write.parquet(dir + "/probe")

    // dump physical types via parquet footer
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val f = new java.io.File(dir + "/probe").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toString), conf))
    rd.getFooter.getFileMetaData.getSchema.getColumns.asScala.foreach { c =>
      println(s"COL ${c.getPath.mkString(".")} -> ${c.getPrimitiveType}")
    }
    rd.getFooter.getBlocks.asScala.foreach { b =>
      b.getColumns.asScala.foreach { c =>
        println(s"STATS ${c.getPath.toDotString}: ${c.getStatistics}")
      }
    }
    rd.close()

    // now round-trip through a graft table and print the manifest
    val t = graft.meta.GraftTable.create(spark, dir + "/t", df.schema)
    t.append(df.repartition(1))
    t.files.show(truncate = false)
    println(s"FOOTER_HITS ${graft.meta.GraftTable.footerInventoryHits.get}")
    spark.stop()
  }
}
