package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Z-order compaction: after one rewrite, selective range scans prune
  * files on BOTH clustered dimensions — the property lexicographic
  * sort-order compaction cannot give the trailing column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // x and y are independent-ish permutations of [0, 1000): a file
  // clustered on x alone has full-range y bounds and vice versa.
  private def data = spark.range(0, 20000).select(
    (col("id") % 1000).as("x"),
    ((col("id") * 7919) % 1000).as("y"),
    col("id").as("payload"))

  private def scannedFraction(t: GraftTable, c: String): Double = {
    val s = t.readPruned(c, lit(100L), lit(199L))
    // correctness first: pruned scan + residual = exact answer
    assert(s.df.filter(col(c).between(100, 199)).count() ==
      data.filter(col(c).between(100, 199)).count())
    s.filesScanned.toDouble / s.filesTotal
  }

  test("z-order rewrite enables pruning on both dimensions") {
    val t = GraftTable.create(spark, tmpDir("zorder") + "/t", data.schema)
    t.append(data.repartition(8)) // unclustered: no pruning on anything
    t.optimizeZOrder(Seq("x", "y"), targetFileBytes = 24 * 1024)
    assert(t.currentSnapshot.get.numFiles > 4, "need enough files to prune")
    val fx = scannedFraction(t, "x")
    val fy = scannedFraction(t, "y")
    assert(fx < 0.8, s"x pruning: scanned fraction $fx")
    assert(fy < 0.8, s"y pruning: scanned fraction $fy")
  }

  test("lexicographic clusterBy prunes only the leading column (contrast)") {
    val t = GraftTable.create(spark, tmpDir("zorder") + "/t", data.schema)
    t.append(data.repartition(8))
    t.optimize(targetFileBytes = 24 * 1024, clusterBy = Seq("x", "y"))
    assert(scannedFraction(t, "x") < 0.8, "leading column prunes")
    assert(scannedFraction(t, "y") == 1.0,
      "trailing column cannot prune under lexicographic order")
  }

  test("row multiset is preserved by the z-order rewrite") {
    val t = GraftTable.create(spark, tmpDir("zorder") + "/t", data.schema)
    t.append(data.repartition(8))
    t.optimizeZOrder(Seq("x", "y"), targetFileBytes = 24 * 1024)
    assert(t.read.orderBy("payload").collect().toSeq ==
      data.orderBy("payload").collect().toSeq)
  }
}
