package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The native FloatDot expression must agree exactly with the
  * higher-order-function fold it replaces (same left-to-right double
  * accumulation), in both codegen and interpreted paths. */
class FloatDotSpec extends SparkSpec {

  test("graft_fdot equals the zip_with+aggregate fold on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vid2"), col("embedding").as("eb"))
    val pairs = a.join(b, col("vec_id") % 97 === col("vid2") % 97)
    val fold = aggregate(
      zip_with(col("ea"), col("eb"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val mismatches = pairs
      .select(call_function("graft_fdot", col("ea"), col("eb")).as("native"),
        fold.as("folded"))
      .filter(col("native") =!= col("folded"))
      .count()
    assert(mismatches == 0)
  }

  test("graft_fdot handles nulls and empty arrays") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_fdot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |       graft_fdot(CAST(NULL AS ARRAY<FLOAT>),
        |                  array(CAST(1.0 AS FLOAT))) AS n,
        |       graft_fdot(CAST(array() AS ARRAY<FLOAT>),
        |                  CAST(array() AS ARRAY<FLOAT>)) AS z
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 4.0)
    assert(r.isNullAt(1))
    assert(r.getDouble(2) == 0.0)
  }

  test("graft_fdot matches the fold's NULL on ragged and null-element input") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_fdot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT))) AS ragged,
        |       graft_fdot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS withnull
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0), "unequal lengths must yield NULL, not truncation")
    assert(r.isNullAt(1), "a null element must yield NULL, not 0-fill")
  }
}
