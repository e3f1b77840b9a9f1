package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The custom single-pass top-k aggregate (graft_top_k): equivalence
  * with the window spelling, tie-break totality, null skipping, bounded
  * buffers across partial/merge paths, and error shapes. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def topk(k: Int) =
    call_function("graft_top_k", $"score", $"id", lit(k))

  test("matches the window row_number spelling, across many partitions") {
    GraftFunctions.ensureRegistered(spark)
    // deterministic data with heavy score ties so the id tie-break works
    val df = spark.range(10000)
      .select($"id", ($"id" % 7).cast("long").as("g"),
        (($"id" * 37) % 101).cast("double").as("score"))
      .repartition(13) // force real partial-aggregate + merge traffic
    val got = df.groupBy($"g").agg(topk(5).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rn"), $"col.id".as("id"),
        $"col.score".as("score"))
    val want = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")
          .orderBy($"score".desc, $"id")))
      .filter($"rn" <= 5)
      .select($"g", $"rn".cast("int").as("rn"), $"id", $"score")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("groups smaller than k return all rows, ranked; nulls are skipped") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (1L, Some(5.0), 10L), (1L, Some(5.0), 9L), (1L, None, 8L),
      (2L, Some(1.0), 1L))
      .toDF("g", "score_opt", "id")
      .select($"g", $"score_opt".as("score"), $"id")
    val rows = df.groupBy($"g").agg(topk(3).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"col.id".as("id")).orderBy($"g", $"id")
      .as[(Long, Long)].collect()
    // g=1: the null-score row dropped; equal scores rank id ASC first
    assert(rows.toSeq == Seq((1L, 9L), (1L, 10L), (2L, 1L)))
  }

  test("k must be a positive INT literal; input types are enforced") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((1L, 1.0, 1L)).toDF("g", "score", "id")
    intercept[Exception] {
      df.groupBy($"g")
        .agg(call_function("graft_top_k", $"score", $"id", lit(0)).as("t"))
        .collect()
    }
    intercept[Exception] {
      // id must be BIGINT — analysis-time failure, not a bad cast later
      df.groupBy($"g")
        .agg(call_function("graft_top_k", $"score", $"score", lit(2)).as("t"))
        .collect()
    }
  }
}
