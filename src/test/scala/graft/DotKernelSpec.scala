package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The r18 fused kernels (graft_ldot / graft_fddot / graft_fl2) must
  * agree EXACTLY with the higher-order-function folds they replace —
  * same accumulation order, same arithmetic widths, same NULL-on-
  * ragged/null-element semantics — in both codegen and interpreted
  * paths. These pins are what make the replacements pure optimizations:
  * the oracle-checked entries (s06/s08/s09/s12/s13 integer dots, d13
  * centroid dots, s05 hyperplane bits, s11/s16 PQ subspace distances)
  * compute bit-identical values through them. */
class DotKernelSpec extends SparkSpec {

  test("graft_ldot equals the zip_with+aggregate long fold on SQ8-like codes") {
    GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // the s06 quantization shape: array<long> codes in [-127, 127]
    val q = e.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 127.0)).as("q"))
    val pairs = q.join(
      q.select(col("vec_id").as("vid2"), col("q").as("q2")),
      col("vec_id") % 53 === col("vid2") % 53)
    val fold = aggregate(zip_with(col("q"), col("q2"), (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    val mismatches = pairs
      .select(call_function("graft_ldot", col("q"), col("q2")).as("native"),
        fold.as("folded"))
      .filter(col("native") =!= col("folded") ||
        col("native").isNull =!= col("folded").isNull)
      .count()
    assert(mismatches == 0)
  }

  test("graft_ldot overflow follows the session ANSI setting, like the fold") {
    GraftFunctions.ensureRegistered(spark)
    // ANSI (Spark 4 default): the fold's Multiply throws — so must the kernel
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    intercept[Throwable] {
      spark.sql(
        s"SELECT graft_ldot(array(${Long.MaxValue}L, 3L), array(2L, 4L))")
        .collect()
    }
    // legacy: both wrap to the same value
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val r = spark.sql(
        s"""SELECT graft_ldot(array(${Long.MaxValue}L, 3L), array(2L, 4L)) AS w,
           |       aggregate(zip_with(array(${Long.MaxValue}L, 3L),
           |                          array(2L, 4L), (x, y) -> x * y),
           |                 0L, (a, x) -> a + x) AS f
           |""".stripMargin).collect()(0)
      assert(r.getLong(0) == r.getLong(1))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("graft_ldot yields NULL on ragged and null-element input") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_ldot(array(1L, 2L), array(1L)) AS ragged,
        |       graft_ldot(array(1L, CAST(NULL AS BIGINT)),
        |                  array(1L, 2L)) AS withnull,
        |       graft_ldot(CAST(array() AS ARRAY<BIGINT>),
        |                  CAST(array() AS ARRAY<BIGINT>)) AS empty
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0), "unequal lengths must yield NULL, not truncation")
    assert(r.isNullAt(1), "a null element must yield NULL, not 0-fill")
    assert(r.getLong(2) == 0L)
  }

  test("graft_fddot equals the float×double-literal fold (d13/s05 shape)") {
    GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    // a deterministic non-trivial double constant vector
    val cents = (0 until dim).map(i => math.sin(i + 1) * 0.77)
    val ce = array(cents.map(lit): _*)
    val fold = aggregate(
      zip_with(col("embedding"), ce, (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x)
    val mismatches = e
      .select(call_function("graft_fddot", col("embedding"), ce).as("native"),
        fold.as("folded"))
      .filter(col("native") =!= col("folded") ||
        col("native").isNull =!= col("folded").isNull)
      .count()
    assert(mismatches == 0)
  }

  test("graft_fddot yields NULL on ragged and null-element input") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_fddot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(1.0D)) AS ragged,
        |       graft_fddot(array(CAST(NULL AS FLOAT)),
        |                   array(2.0D)) AS withnull
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
  }

  test("graft_fl2 equals the squared-difference fold (s11/s16 PQ shape)") {
    GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sub = e.select(col("vec_id"),
      expr("slice(embedding, 1, 8)").as("sv"))
    val pairs = sub.join(
      sub.select(col("vec_id").as("vid2"), col("sv").as("cv")),
      col("vec_id") % 31 === col("vid2") % 31)
    val fold = aggregate(zip_with(col("sv"), col("cv"), (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val mismatches = pairs
      .select(call_function("graft_fl2", col("sv"), col("cv")).as("native"),
        fold.as("folded"))
      .filter(col("native") =!= col("folded") ||
        col("native").isNull =!= col("folded").isNull)
      .count()
    assert(mismatches == 0)
  }

  test("graft_fl2 yields NULL on ragged input and 0.0 on empty arrays") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_fl2(array(CAST(1.0 AS FLOAT)),
        |                 array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS ragged,
        |       graft_fl2(CAST(array() AS ARRAY<FLOAT>),
        |                 CAST(array() AS ARRAY<FLOAT>)) AS empty
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
  }
}
