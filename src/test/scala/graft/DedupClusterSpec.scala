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
