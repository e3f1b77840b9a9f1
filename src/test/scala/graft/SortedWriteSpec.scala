package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** `sorted_by` write clustering (Trino Iceberg's sorted tables):
  * appends and compactions range-cluster by the configured sort order,
  * so every data file covers a tight value range and min/max file
  * skipping works on the sort columns without any explicit clustering
  * by the writer. */
class SortedWriteSpec extends SparkSpec {

  private def pointScan(t: GraftTable, v: Long) =
    t.readPruned("id", lit(v), lit(v))

  test("sorted_by appends tile the value range; point scans skip files") {
    val df = spark.range(0, 4000).select(col("id"), (col("id") % 7).as("v"))
    val t = GraftTable.create(spark, tmpDir("sorted1") + "/t", df.schema)
    t.setProperties(Map("sorted_by" -> "id"))
    t.append(df.repartition(4)) // round-robin input; the write re-clusters
    val scan = pointScan(t, 1234L)
    assert(scan.filesTotal >= 3,
      s"expected several files, got ${scan.filesTotal}")
    assert(scan.filesScanned == 1,
      s"scanned ${scan.filesScanned}/${scan.filesTotal}")
    assert(scan.df.filter(col("id") === 1234).count() == 1)
    assert(t.read.count() == 4000)

    // control: identical input without the property — round-robin files
    // all span the whole range, nothing can be skipped
    val u = GraftTable.create(spark, tmpDir("sorted1u") + "/t", df.schema)
    u.append(df.repartition(4))
    val uscan = pointScan(u, 1234L)
    assert(uscan.filesScanned == uscan.filesTotal)
  }

  test("DESC entries cluster the same; malformed entries fail loudly") {
    val df = spark.range(0, 1000).toDF("id")
    val t = GraftTable.create(spark, tmpDir("sorted2") + "/t", df.schema)
    t.setProperties(Map("sorted_by" -> "id DESC"))
    t.append(df.repartition(4))
    val scan = pointScan(t, 10L)
    assert(scan.filesTotal >= 3 && scan.filesScanned == 1,
      s"scanned ${scan.filesScanned}/${scan.filesTotal}")
    t.setProperties(Map("sorted_by" -> "id SIDEWAYS"))
    intercept[IllegalArgumentException](t.append(df))
    t.setProperties(Map("sorted_by" -> "nope"))
    intercept[IllegalArgumentException](t.append(df))
  }

  test("binpack compaction re-clusters by the sort order") {
    val t = GraftTable.create(spark, tmpDir("sorted3") + "/t",
      spark.range(1).toDF("id").schema)
    t.setProperties(Map("sorted_by" -> "id"))
    // each append tiles ITS OWN batch, but the interleaved batches
    // overlap across appends — a point value lands in one file per append
    (0 until 4).foreach(i =>
      t.append(spark.range(i, 20000, 4).toDF("id").repartition(2)))
    val before = pointScan(t, 1234L)
    assert(before.filesScanned >= 4,
      s"per-append tiles must overlap, scanned ${before.filesScanned}")
    // small target → several output files; binpack must range-cluster
    // them by the sort order, not round-robin
    t.optimize(targetFileBytes = 16 * 1024)
    val after = pointScan(t, 1234L)
    assert(after.filesTotal >= 3,
      s"expected a multi-file compaction, got ${after.filesTotal}")
    assert(after.filesScanned == 1,
      s"scanned ${after.filesScanned}/${after.filesTotal}")
    assert(t.read.count() == 20000)
  }
}
