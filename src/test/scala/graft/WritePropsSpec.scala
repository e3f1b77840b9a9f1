package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Iceberg write properties: `write.parquet.compression-codec` steers
  * every table-owned parquet write, and `write.target-file-size-bytes`
  * is the optimize default when no explicit target is passed. */
class WritePropsSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(t: GraftTable): Seq[String] =
    t.files.select("path").as[String].collect().toSeq

  test("compression-codec property applies to appends, upserts, optimize") {
    val df = spark.range(0, 1000).select($"id", ($"id" % 7).as("k"))
    val t = GraftTable.create(spark, tmpDir("wprops") + "/t", df.schema)
    t.setProperties(Map("write.parquet.compression-codec" -> "zstd"))
    t.append(df)
    assert(dataFiles(t).forall(_.contains("zstd")),
      s"append must honor the codec: ${dataFiles(t).head}")
    t.upsert(df.filter($"id" < 10).withColumn("k", lit(99L)), Seq("id"))
    t.optimize()
    assert(dataFiles(t).forall(_.contains("zstd")),
      "optimize rewrite must honor the codec")
    assert(t.read.filter($"k" === 99L).count() == 10)
    // unset -> back to the session default (snappy)
    t.setProperties(Map("write.parquet.compression-codec" -> null))
    t.append(df)
    assert(dataFiles(t).exists(!_.contains("zstd")))
  }

  test("target-file-size-bytes property is the optimize default") {
    val df = spark.range(0, 50000).select($"id",
      concat(lit("pad-pad-pad-"), $"id").as("v"))
    val t = GraftTable.create(spark, tmpDir("wtarget") + "/t", df.schema)
    (0 until 3).foreach(_ => t.append(df.repartition(2)))
    // a tiny target must split the compaction output into many files
    t.setProperties(Map("write.target-file-size-bytes" -> "65536"))
    assert(t.defaultTargetFileBytes == 65536L)
    t.optimize()
    assert(dataFiles(t).size > 3,
      s"64 KiB target must yield several output files (${dataFiles(t).size})")
    assert(t.read.count() == 150000)
  }
}
