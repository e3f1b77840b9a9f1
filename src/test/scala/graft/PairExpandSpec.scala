package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The graft_pairs generator (+ id-orientation/filter layer) must emit
  * EXACTLY the pair multiset of the composable fold it replaced in
  * saltedPairExpansion — `flatten(transform(ds, x -> filter(
  * transform(ds, y -> struct(...)), p -> p.a.id < p.b.id)))` — on
  * real bucket shapes, including id ties (dropped) and null/small
  * arrays (no emission). */
class PairExpandSpec extends SparkSpec {

  private def foldPairs(dsCol: String): String =
    s"flatten(transform($dsCol, x -> filter(transform($dsCol, y -> " +
      "named_struct('a', x.mbr, 'b', y.mbr, 'ga', x.g, 'gb', y.g)), " +
      "p -> p.a.`id` < p.b.`id`)))"

  test("graft_pairs + orientation equals the composable fold on bucket arrays") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // bucket shapes: normal, id-tie, singleton, empty-after-grouping
    val rows = Seq(
      (1L, Seq((10L, 0), (3L, 1), (7L, 2), (5L, 0))),
      (2L, Seq((4L, 0), (4L, 1), (9L, 0))), // id tie: (4,4) must drop
      (3L, Seq((42L, 0))),
      (4L, Seq((2L, 1), (1L, 0)))
    ).toDF("bucket", "raw")
      .select($"bucket", transform($"raw",
        r => struct(struct(r.getField("_1").as("id")).as("mbr"),
          r.getField("_2").as("g"))).as("ds"))
    val folded = rows
      .select($"bucket", explode(expr(foldPairs("ds"))).as("p"))
      .select($"bucket", $"p.a.id".as("a"), $"p.b.id".as("b"),
        $"p.ga".as("ga"), $"p.gb".as("gb"))
    val xid = col("x.mbr").getField("id")
    val yid = col("y.mbr").getField("id")
    val fwd = struct($"x.mbr".as("a"), $"y.mbr".as("b"),
      $"x.g".as("ga"), $"y.g".as("gb"))
    val rev = struct($"y.mbr".as("a"), $"x.mbr".as("b"),
      $"y.g".as("ga"), $"x.g".as("gb"))
    val gen = rows
      .select($"bucket", call_function("graft_pairs", $"ds").as(Seq("x", "y")))
      .select($"bucket", when(xid < yid, fwd).when(yid < xid, rev).as("p"))
      .filter($"p".isNotNull)
      .select($"bucket", $"p.a.id".as("a"), $"p.b.id".as("b"),
        $"p.ga".as("ga"), $"p.gb".as("gb"))
    val f = folded.collect().map(_.toSeq).toSeq
      .sortBy(_.map(_.toString).mkString(","))
    val g = gen.collect().map(_.toSeq).toSeq
      .sortBy(_.map(_.toString).mkString(","))
    assert(g == f)
    assert(f.nonEmpty)
    // the id-tie pair (4,4) of bucket 2 must be absent from both
    assert(!f.exists(r => r(1) == 4L && r(2) == 4L))
  }

  test("d05's verified pair set is unchanged through the generator path") {
    GraftFunctions.ensureRegistered(spark)
    // end-to-end pin on real data: the d05 oracle-checked pair relation
    // flows through saltedPairExpansion (small + salted-big branches)
    val d05 = SparkEntry.queries("d05_ngram_jaccard")(
      spark, "/root/testdata/sf0.01")
    val rows = d05.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
    assert(rows.length == 24) // CORRECTNESS_r17 row count for sf0.01
    assert(rows.distinct.length == rows.length)
  }
}
