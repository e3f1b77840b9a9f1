package graft

import org.apache.spark.sql.functions._

import graft.rel.Tables

/** The table-load plan memo's staleness guard (r19): the r18 guard was
  * the directory mtime alone — 1 s granularity on common filesystems,
  * so an append landing within the same second as the memoized build
  * was served STALE. The fingerprint now hashes every child's
  * (name, length, mtime), so any listing change invalidates even when
  * the directory mtime is unchanged. */
class TablesMemoSpec extends SparkSpec {

  test("load sees an append that does not move the directory mtime") {
    val dir = tmpDir("tablesmemo")
    val tblDir = new java.io.File(s"$dir/customer.parquet")
    spark.range(0, 10).select(col("id").as("c_custkey"),
        lit("a").as("c_name"))
      .coalesce(1).write.mode("overwrite").parquet(tblDir.toString)
    assert(Tables.load(spark, dir, "customer").count() == 10)
    val mtime0 = tblDir.lastModified
    // append a second parquet file, then FORCE the directory mtime back
    // to its memoized value — the same-second-append shape the r18
    // mtime-only guard could not see
    val extra = s"$dir/extra"
    spark.range(100, 105).select(col("id").as("c_custkey"),
        lit("b").as("c_name"))
      .coalesce(1).write.mode("overwrite").parquet(extra)
    val part = new java.io.File(extra).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(part.renameTo(new java.io.File(tblDir, part.getName)))
    assert(tblDir.setLastModified(mtime0))
    assert(tblDir.lastModified == mtime0, "fixture: dir mtime pinned")
    assert(Tables.load(spark, dir, "customer").count() == 15,
      "the memo served a stale listing after a same-mtime append")
  }

  test("a missing path is never memoized as fresh") {
    val dir = tmpDir("tablesmemo2")
    intercept[Throwable] { Tables.load(spark, dir, "customer").count() }
    // now create it — the earlier failed stat must not pin anything
    spark.range(0, 3).select(col("id").as("c_custkey"),
        lit("a").as("c_name"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    assert(Tables.load(spark, dir, "customer").count() == 3)
  }
}
