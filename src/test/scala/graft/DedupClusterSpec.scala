package graft

import graft.ext.DedupQueries

/** Pins the connected-components propagation behind d09_dedup_clusters:
  * transitive chains collapse to one cluster labeled by the min id,
  * disjoint components stay separate, and the round count is bounded by
  * the component diameter (not the corpus size).
  */
class DedupClusterSpec extends SparkSpec {

  private def components(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    DedupQueries.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
  }

  test("a transitive chain is one cluster labeled by its min id") {
    // 1-2, 2-3, 3-4: 1 and 4 are never directly paired
    assert(components((1L, 2L), (2L, 3L), (3L, 4L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate representatives") {
    assert(components((1L, 2L), (10L, 11L), (11L, 12L)) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("edge direction does not matter and cycles converge") {
    // labels must flow against the given orientation too, and a cycle
    // must not loop forever
    assert(components((5L, 2L), (2L, 9L), (9L, 5L)) ==
      Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("a degenerate giant cluster caps its member list and counts overflow") {
    import spark.implicits._
    // star graph: hub 0 paired with 300 spokes → one 301-member cluster
    val pairs = (1L to 300L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val rows = DedupQueries.clusterSummary(pairs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 0L)       // cluster_rep = min id
    assert(r.getLong(1) == 301L)     // full membership still counted
    val members = r.getString(2).split(",").map(_.toLong).toSeq
    assert(members.size == DedupQueries.MaxMembers,
      s"member list must cap at ${DedupQueries.MaxMembers}, got ${members.size}")
    assert(members == (0L until DedupQueries.MaxMembers.toLong).toSeq,
      "the cap must keep the FIRST ids by id order")
    assert(r.getLong(3) == 301L - DedupQueries.MaxMembers) // n_overflow
    // a small cluster reports zero overflow and its full list
    val small = DedupQueries.clusterSummary(
      Seq((7L, 9L), (9L, 8L)).toDF("doc_a", "doc_b")).collect().head
    assert(small.getString(2) == "7,8,9" && small.getLong(3) == 0L)
  }

  test("a ubiquitous shingle takes the salted expansion; results unchanged") {
    import spark.implicits._
    val dir = tmpDir("dedupsalt")
    // 150 identical docs — EVERY prefix-shingle bucket holds all 150
    // members, far over the 64-member salting threshold — plus two
    // unrelated docs that must not pair with anything
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = ((0 until 150).map(i => (i.toLong, text)) ++ Seq(
      (900L, "one two three four five six seven"),
      (901L, "red orange yellow green blue indigo violet")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.d05NgramJaccard(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // every identical pair found exactly once at jac 1.0, nothing else
    assert(got.size == 150 * 149 / 2, s"expected all-pairs, got ${got.size}")
    assert(got.forall(_._3 == 1.0))
    assert(got.forall(p => p._1 < p._2 && p._2 < 150L))
    assert(got.map(p => (p._1, p._2)).distinct.size == got.size)
  }

  test("salted expansion equals brute-force pairing, multiplicity included") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // bucket sizes straddle the 64-member salting threshold; ids can
    // repeat ACROSS buckets (pairs then count once per bucket)
    val rows = Seq(5, 80, 200, 64, 65).zipWithIndex.flatMap { case (n, b) =>
      rnd.shuffle((0 until 100000).toList).take(n)
        .map(i => (b.toLong, i.toLong))
    }
    val got = DedupQueries.saltedPairExpansion(
      rows.toDF("bkt", "id"), Seq("bkt"), Seq($"id"), "id")
      .select($"a.id", $"b.id").as[(Long, Long)].collect().toSeq
    val expect = rows.groupBy(_._1).values.toSeq.flatMap { ms =>
      val ids = ms.map(_._2)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }
    assert(got.sorted == expect.sorted,
      s"got ${got.size} pairs, expected ${expect.size}")
  }

  test("d09 over the documents table groups every doc into one cluster") {
    val df = DedupQueries.d09DedupClusters(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every member list starts with its representative and sizes agree
    rows.foreach { r =>
      val rep = r.getLong(0)
      val members = r.getString(2).split(",").map(_.toLong).toSeq
      assert(members.head == rep)
      assert(members.size == r.getLong(1))
      assert(members == members.sorted)
    }
    // cluster members are disjoint across clusters
    val all = rows.flatMap(_.getString(2).split(",")).toSeq
    assert(all.distinct.size == all.size)
  }
}
