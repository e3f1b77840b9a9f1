package graft

import graft.functions.GraftFunctions

/** The native AdcSum expression must agree exactly with the
  * aggregate/element_at fold it replaces in s16's ADC scan — including
  * the NULL contract (missing m-key, missing code, ragged codes). */
class AdcSumSpec extends SparkSpec {

  private def q(sql: String) = spark.sql(sql).collect()(0)

  test("graft_adc sums qtab[m][codes[m]] by key value, not position") {
    GraftFunctions.ensureRegistered(spark)
    // m-keys deliberately OUT OF ORDER and inner code ids sparse
    // (10, 40) — a positional lookup would produce a different sum
    val r = q(
      """SELECT graft_adc(
        |  array(CAST(40 AS BIGINT), CAST(10 AS BIGINT)),
        |  map(1, map(CAST(10 AS BIGINT), CAST(7 AS BIGINT),
        |             CAST(40 AS BIGINT), CAST(100 AS BIGINT)),
        |      0, map(CAST(10 AS BIGINT), CAST(3 AS BIGINT),
        |             CAST(40 AS BIGINT), CAST(5 AS BIGINT)))) AS s
        |""".stripMargin)
    // m=0 → codes[0]=40 → 5; m=1 → codes[1]=10 → 7
    assert(r.getLong(0) == 12L)
  }

  test("graft_adc equals the aggregate/element_at fold on the real s16 shapes") {
    GraftFunctions.ensureRegistered(spark)
    // rebuild the s16 inputs at sf0.001 and compare both kernels row
    // by row over the full ADC scan input
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val sub = e.select(col("vec_id"),
        explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        expr("slice(embedding, m * 8 + 1, 8)").as("sv"))
    val cb = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c"), col("m"), col("sv").as("cv"))
    val dists = sub.join(broadcast(cb), Seq("m"))
      .withColumn("di", (expr(
        "aggregate(zip_with(sv, cv, (x, y) -> " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (a, v) -> a + v)"
        ) * 1e6).cast("long"))
      .select(col("vec_id"), col("m"), col("c"), col("di"))
    val codes = dists.groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("di"), col("c"))).as("mc"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"),
        col("mc.c").as("code")))), x => x.getField("code")).as("codes"))
    val qtab = dists.filter(col("vec_id") < 8)
      .groupBy(col("vec_id"), col("m"))
      .agg(map_from_entries(collect_list(struct(col("c"), col("di"))))
        .as("mrow"))
      .groupBy(col("vec_id"))
      .agg(map_from_entries(collect_list(struct(col("m"), col("mrow"))))
        .as("qtab"))
      .select(col("vec_id").as("query_id"), col("qtab"))
    val mismatches = codes.crossJoin(broadcast(qtab))
      .select(
        call_function("graft_adc", col("codes"), col("qtab")).as("native"),
        expr("aggregate(sequence(0, 7), 0L, (acc, m) -> " +
          "acc + element_at(element_at(qtab, m), " +
          "element_at(codes, m + 1)))").as("folded"))
      .filter(not(col("native") <=> col("folded")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_adc NULL contract: missing code, missing m-key, ragged codes") {
    GraftFunctions.ensureRegistered(spark)
    val r = q(
      """SELECT
        |  graft_adc(array(CAST(99 AS BIGINT)),
        |    map(0, map(CAST(1 AS BIGINT), CAST(5 AS BIGINT)))) AS miss_code,
        |  graft_adc(array(CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |    map(0, map(CAST(1 AS BIGINT), CAST(5 AS BIGINT)))) AS ragged,
        |  graft_adc(CAST(array() AS ARRAY<BIGINT>),
        |    CAST(map() AS MAP<INT, MAP<BIGINT, BIGINT>>)) AS empty
        |""".stripMargin)
    assert(r.isNullAt(0), "missing code must be NULL, not a partial sum")
    assert(r.isNullAt(1), "codes longer than the subspace table must be NULL")
    // empty inputs are NULL, not a perfect 0 distance: an empty pair
    // scored 0 would silently rank top-1 in s16's ascending ADC rank
    // instead of tripping its raise_error drift guard
    assert(r.isNullAt(2), "empty codes/qtab must be NULL, not 0")
  }
}
