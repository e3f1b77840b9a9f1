package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** In-place parquet adoption (Iceberg `add_files`): external files are
  * referenced by the manifest without copying, read back exactly,
  * refused on re-adoption or schema mismatch, and managed by
  * maintenance like any other file afterwards. */
class AddFilesSpec extends SparkSpec {
  import spark.implicits._

  test("add_files adopts parquet in place and reads it back exactly") {
    val dir = tmpDir("addf")
    val df = spark.range(0, 100)
      .select($"id", ($"id" % 7).as("g"), concat(lit("d"), $"id").as("v"))
    df.coalesce(2).write.parquet(s"$dir/raw")
    val t = GraftTable.create(spark, s"$dir/t", df.schema)
    val n = t.addFiles(s"$dir/raw")
    assert(n == 2)
    assert(t.rowCount == 100, "manifest row counts must come from footers")
    assert(t.read.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 100L))
    // metadata-only: not a byte landed under the table's own data dir
    assert(GraftTable.listFiles(t.fileSystem,
      new Path(s"$dir/t")).forall(f =>
        !f.getPath.toString.contains("/data/")),
      "adoption must not copy data into the table directory")
    // the manifest references the external files in place
    assert(t.files.filter(col("path").contains("/raw/")).count() == 2)

    // re-adoption would double-count every row — refused
    val e = intercept[IllegalArgumentException](t.addFiles(s"$dir/raw"))
    assert(e.getMessage.contains("already referenced"))

    // schema mismatch fails loudly
    spark.range(5).select($"id".cast("int").as("id"))
      .write.parquet(s"$dir/raw2")
    val e2 = intercept[IllegalArgumentException](t.addFiles(s"$dir/raw2"))
    assert(e2.getMessage.contains("schema mismatch"))

    // adopted and native files coexist; pruning still works on both
    t.append(df.withColumn("id", $"id" + 100))
    assert(t.rowCount == 200)
    assert(t.read.count() == 200)

    // adopted files are table-managed: a row-level delete and a
    // compaction treat them like any other file
    assert(t.deleteWhere($"id" < 10) == 10L)
    t.optimize(targetFileBytes = 64 * 1024 * 1024)
    assert(t.read.count() == 190)
  }

  test("the SQL spelling routes location and validates format") {
    val dir = tmpDir("addfsql")
    val df = spark.range(0, 10).select($"id")
    df.write.parquet(s"$dir/raw")
    val t = GraftTable.create(spark, s"$dir/t", df.schema)
    graft.sql.GraftSql.exec(spark, "ALTER TABLE t EXECUTE add_files(" +
      s"location => '$dir/raw', format => 'PARQUET')", _ => t)
    assert(t.rowCount == 10)
    val e = intercept[IllegalArgumentException](
      graft.sql.GraftSql.exec(spark, "ALTER TABLE t EXECUTE add_files(" +
        s"location => '$dir/raw', format => 'ORC')", _ => t))
    assert(e.getMessage.contains("PARQUET"))
    intercept[IllegalArgumentException](
      graft.sql.GraftSql.exec(spark,
        "ALTER TABLE t EXECUTE add_files(format => 'PARQUET')", _ => t))
  }
}
