package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** GraftCountRule: a global unfiltered count(*) over a graft scan is
  * answered from snapshot metadata — the optimized plan is a
  * LocalRelation, no file scan — while anything the metadata cannot
  * answer exactly (filters, count(col), MOR deletes, grouping) keeps
  * the scan and stays correct. */
class CountPushdownSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select($"id",
      when($"id" % 3 === 0, lit(null)).otherwise(concat(lit("v"), $"id"))
        .as("v"))

  // metadata-only = no scan over a GraftFileIndex survives optimization
  // (the min/max fold keeps a KB-scale manifest relation — that is
  // still metadata, not the data files)
  private def isMetadataOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
        if lr.relation.isInstanceOf[
             org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
           lr.relation.asInstanceOf[
             org.apache.spark.sql.execution.datasources.HadoopFsRelation]
             .location.isInstanceOf[graft.sources.GraftFileIndex] => lr
    }.isEmpty

  test("bare count(*) folds to the snapshot row count — no scan") {
    val loc = tmpDir("cnt") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 500))
    t.append(rows(500, 800))
    val scan = spark.read.format("graft").load(loc)
    val cnt = scan.groupBy().count()
    assert(isMetadataOnly(cnt), "unfiltered count(*) must fold to metadata:\n" +
      cnt.queryExecution.optimizedPlan.treeString)
    assert(cnt.collect().head.getLong(0) == 800L)
    assert(scan.count() == 800L)
    // SQL spelling folds too
    scan.createOrReplaceTempView("cnt_t")
    val sqlCnt = spark.sql("SELECT count(*) AS n FROM cnt_t")
    assert(isMetadataOnly(sqlCnt))
    assert(sqlCnt.collect().head.getLong(0) == 800L)
    // a projection below the count is row-preserving — still folds
    val projected = scan.select($"id").groupBy().count()
    assert(isMetadataOnly(projected))
    assert(projected.collect().head.getLong(0) == 800L)
  }

  test("min/max of a bounded column fold to manifest bounds — no data scan") {
    val loc = tmpDir("cntmm") + "/t"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("maybe", LongType, nullable = true),
      StructField("s", StringType, nullable = true))))
    // file 1: ids 10..99, maybe all null (null bound must be IGNORED,
    // not treated as a value); file 2: ids 0..9, maybe = id * 2
    t.append(spark.range(10, 100).select($"id",
      lit(null).cast("long").as("maybe"), lit("a").as("s")))
    t.append(spark.range(0, 10).select($"id", ($"id" * 2).as("maybe"),
      lit("b").as("s")))
    val scan = spark.read.format("graft").load(loc)
    val mm = scan.agg(min($"id").as("lo"), max($"id").as("hi"),
      count(lit(1)).as("n"), min($"maybe").as("mlo"), max($"maybe").as("mhi"))
    assert(isMetadataOnly(mm), "min/max over bounded columns must fold:\n" +
      mm.queryExecution.optimizedPlan.treeString)
    val r = mm.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((0L, 99L, 100L, 0L, 18L)))
    // a rename below the aggregate is followed to the source column
    val renamed = scan.select($"id".as("renamed")).agg(max($"renamed"))
    assert(isMetadataOnly(renamed))
    assert(renamed.collect().head.getLong(0) == 99L)
    // strings are NOT folded (footer truncation hazard) — scan + correct
    val sMin = scan.agg(min($"s"))
    assert(!isMetadataOnly(sMin), "string min/max must keep the scan")
    assert(sMin.collect().head.getString(0) == "a")
    // a computed column can't fold — scan + correct
    val computed = scan.select(($"id" + 1).as("idp")).agg(min($"idp"))
    assert(!isMetadataOnly(computed))
    assert(computed.collect().head.getLong(0) == 1L)
  }

  test("filters, count(col), and grouping keep the scan — and stay right") {
    val loc = tmpDir("cntneg") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 300))
    val scan = spark.read.format("graft").load(loc)
    val filtered = scan.filter($"id" < 100).groupBy().count()
    assert(!isMetadataOnly(filtered), "a filtered count must scan")
    assert(filtered.collect().head.getLong(0) == 100L)
    val countCol = scan.agg(count($"v"))
    assert(!isMetadataOnly(countCol), "count(col) skips nulls — must scan")
    assert(countCol.collect().head.getLong(0) == 200L) // 100 of 300 are null
    val grouped = scan.groupBy($"id" % 2).count()
    assert(!isMetadataOnly(grouped), "grouped counts must scan")
    assert(grouped.collect().map(_.getLong(1)).sum == 300L)
  }

  test("a DataFrame held across a commit folds to ITS pinned snapshot") {
    val loc = tmpDir("cntpin") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 100))
    val df = spark.read.format("graft").load(loc)
    assert(df.collect().length == 100) // index pinned to snapshot 1
    t.append(rows(100, 160)) // a concurrent commit lands AFTER the load
    // snapshot isolation (ADVICE r17): the fold must serve the SAME
    // snapshot the pinned file list came from — never the new head
    val cnt = df.groupBy().count()
    assert(isMetadataOnly(cnt))
    assert(cnt.collect().head.getLong(0) == 100L,
      "count must fold to the pinned snapshot, not the current one")
    assert(df.count() == 100L)
    assert(df.collect().length == 100)
    // and mixed count+min/max stay internally consistent (one snapshot)
    val mm = df.agg(count(lit(1)).as("n"), max($"id").as("hi")).collect().head
    assert((mm.getLong(0), mm.getLong(1)) == ((100L, 99L)))
    // a FRESH load sees the new head
    assert(spark.read.format("graft").load(loc).count() == 160L)
  }

  test("time travel composes: pinned snapshot folds to ITS count") {
    val loc = tmpDir("cnttt") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 100)) // s1
    t.append(rows(100, 250)) // s2
    val pinned = spark.read.format("graft")
      .option("snapshotId", "1").load(loc).groupBy().count()
    assert(isMetadataOnly(pinned))
    assert(pinned.collect().head.getLong(0) == 100L)
  }

  test("outstanding MOR deletes refuse the fold; the read path stays exact") {
    val loc = tmpDir("cntmor") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(rows(0, 100))
    t.deleteWhereMOR(col("id") < 10) // MOR position delete, no rewrite
    // GraftTable.read plans delete anti-joins above the relation — the
    // bare-child bound alone prevents the fold; the count stays exact
    val viaRead = t.read.groupBy().count()
    assert(viaRead.collect().head.getLong(0) == 90L)
    // and even a forced bare relation must refuse (metadataRowCount None)
    val bare = spark.read.format("graft")
      .option("graft.internal.allowDeletes", "true").load(loc)
      .groupBy().count()
    assert(!isMetadataOnly(bare),
      "a delete-bearing snapshot must never fold count(*) to metadata")
    assert(bare.collect().head.getLong(0) == 100L) // physical rows, pre-join
  }
}
