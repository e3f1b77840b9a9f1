package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable
import graft.operators.JoinPrune

/** Runtime join file skipping: the build side's key [min, max] prunes
  * the fact scan's files through the manifest before the join. */
class JoinPruneSpec extends SparkSpec {

  private def sortedFact(prefix: String): GraftTable = {
    val df = spark.range(0, 4000)
      .select(col("id"), (col("id") % 97).as("v"))
    val t = GraftTable.create(spark, tmpDir(prefix) + "/t", df.schema)
    t.setProperties(Map("sorted_by" -> "id"))
    t.append(df.repartition(4)) // write re-clusters into tiled files
    t
  }

  test("build-side bounds skip fact files; result matches the plain join") {
    import spark.implicits._
    val t = sortedFact("jp1")
    val build = spark.range(100, 150).toDF("k")
      .withColumn("tag", concat(lit("b"), col("k")))
    val pj = JoinPrune.joinPruned(t, "id", build, "k")
    assert(pj.filesTotal >= 3, s"expected several files, got ${pj.filesTotal}")
    assert(pj.filesScanned < pj.filesTotal,
      s"scanned ${pj.filesScanned}/${pj.filesTotal}")
    val got = pj.df.select($"id", $"v", $"tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val fact = t.read
    val want = fact.join(build, fact("id") === build("k"))
      .select($"id", $"v", $"tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got == want && got.size == 50)
  }

  test("semi join keeps fact columns only; empty build scans nothing") {
    import spark.implicits._
    val t = sortedFact("jp2")
    val build = spark.range(200, 210).toDF("k")
    val semi = JoinPrune.joinPruned(t, "id", build, "k", "semi")
    assert(semi.df.columns.toSeq == Seq("id", "v"))
    assert(semi.df.count() == 10)
    assert(semi.filesScanned < semi.filesTotal)

    val empty = JoinPrune.joinPruned(t, "id",
      spark.range(0).toDF("k"), "k")
    assert(empty.filesScanned == 0 && empty.df.count() == 0)
  }

  test("fact-preserving join types are refused") {
    val t = sortedFact("jp3")
    val build = spark.range(5).toDF("k")
    intercept[IllegalArgumentException](
      JoinPrune.joinPruned(t, "id", build, "k", "left"))
    intercept[IllegalArgumentException](
      JoinPrune.joinPruned(t, "id", build, "k", "full_outer"))
  }
}
