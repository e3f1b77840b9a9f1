package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

/** Unit semantics + plan shape for the key-based state reconciliation
  * operator (x21's engine). */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: (Long, String, Long)*) =
    rows.toDF("k", "name", "v")

  test("classifies added / removed / changed / unchanged; null-safe") {
    val from = state((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .union(Seq((4L, null.asInstanceOf[String], 40L)).toDF("k", "name", "v"))
    val to = state((2L, "b", 20L), (3L, "c", 99L), (5L, "e", 50L))
      .union(Seq((4L, null.asInstanceOf[String], 40L)).toDF("k", "name", "v"))
    val r = SnapshotDiff.summary(from, to, Seq("k")).collect()(0)
    assert(r.getAs[Long]("n_added") == 1)      // k=5
    assert(r.getAs[Long]("n_removed") == 1)    // k=1
    assert(r.getAs[Long]("n_changed") == 1)    // k=3 (v 30→99)
    // k=2 identical, k=4 identical with a NULL attr (<=> must match)
    assert(r.getAs[Long]("n_unchanged") == 2)
    assert(r.getAs[Long]("n_rows_from") == 4)
    assert(r.getAs[Long]("n_rows_to") == 4)
  }

  test("identical states diff to all-unchanged; empty-to diff to all-removed") {
    val a = state((1L, "x", 1L), (2L, "y", 2L))
    val same = SnapshotDiff.summary(a, a, Seq("k")).collect()(0)
    assert(same.getAs[Long]("n_unchanged") == 2 &&
      same.getAs[Long]("n_added") == 0 && same.getAs[Long]("n_changed") == 0)
    val gone = SnapshotDiff.summary(a, a.limit(0), Seq("k")).collect()(0)
    assert(gone.getAs[Long]("n_removed") == 2 &&
      gone.getAs[Long]("n_rows_to") == 0)
  }

  test("composite keys supported; schema mismatch fails loudly") {
    val from = Seq((1L, "p1", 5L), (1L, "p2", 6L)).toDF("k", "p", "v")
    val to = Seq((1L, "p1", 5L), (1L, "p3", 7L)).toDF("k", "p", "v")
    val r = SnapshotDiff.summary(from, to, Seq("k", "p")).collect()(0)
    assert(r.getAs[Long]("n_added") == 1 && r.getAs[Long]("n_removed") == 1 &&
      r.getAs[Long]("n_unchanged") == 1)
    intercept[IllegalArgumentException] {
      SnapshotDiff.summary(from, to.withColumnRenamed("v", "w"), Seq("k"))
    }
  }

  test("plan: one co-partitioned equi-join, each row shipped once") {
    val from = spark.range(5000).select($"id".as("k"),
      ($"id" % 7).as("a"), ($"id" % 11).as("b"))
    val to = from.withColumn("a",
      when($"k" % 100 === 0, $"a" + 1).otherwise($"a"))
    val df = SnapshotDiff.summary(from, to, Seq("k"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "reconciliation must be an equi-join on the key")
    // attrs pack into ONE struct per side before the exchange: the
    // join output carries exactly key + two structs
    assert(df.queryExecution.optimizedPlan.toString.contains("_attrs_f"))
  }
}
