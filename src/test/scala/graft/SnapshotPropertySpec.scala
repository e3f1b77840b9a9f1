package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.meta.GraftTable

/** Property-based snapshot-layer invariants (SURVEY.md §5): for random
  * row sets and batch splits —
  *   - optimize preserves the row multiset exactly and compacts to the
  *     expected file count;
  *   - expire_snapshots never deletes a file reachable from a retained
  *     snapshot (the current snapshot always reads back intact).
  *
  * Cases are drawn from ScalaCheck generators with a fixed seed (each
  * case spins several Spark jobs, so the count stays small and the run
  * deterministic).
  */
class SnapshotPropertySpec extends SparkSpec {

  private val ab = StructType(Seq(
    StructField("a", StringType), StructField("b", StringType)))

  private val rowGen: Gen[(String, String)] = for {
    a <- Gen.option(Gen.alphaNumStr.map(_.take(8)))
    b <- Gen.option(Gen.oneOf("x", "y", "z"))
  } yield (a.orNull, b.orNull)

  private val batchesGen: Gen[List[List[(String, String)]]] =
    Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(Gen.listOfN(_, rowGen))))

  private def cases(n: Int): Seq[List[List[(String, String)]]] =
    (0 until n).map(i => batchesGen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def multiset(t: GraftTable): Map[Seq[Any], Int] =
    t.read.collect().toSeq.map(_.toSeq).groupBy(identity).map {
      case (k, v) => k -> v.size
    }

  test("optimize preserves the multiset; expiry keeps live data readable") {
    cases(5).foreach { batches =>
      val clock = new TestClock
      val t = GraftTable.create(spark, tmpDir("prop") + "/t", ab)
      batches.foreach { rows =>
        t.append(spark.createDataFrame(
          rows.map { case (a, b) => Row(a, b) }.asJava, ab), clock)
      }
      val before = multiset(t)
      // each append commits >=1 file (multi-row batches parallelize into
      // up to defaultParallelism part files)
      assert(t.files.count() >= batches.size)

      t.optimize(clock = clock)
      assert(t.files.count() == 1)
      assert(multiset(t) == before, s"multiset changed for $batches")

      // expire everything old: current snapshot must stay fully readable
      clock.advanceDays(30)
      t.append(spark.createDataFrame(
        Seq(Row("fresh", "row")).asJava, ab), clock)
      t.expireSnapshots(retentionDays = 7, clock = clock)
      val after = multiset(t)
      assert(after(Seq("fresh", "row")) == 1)
      before.foreach { case (k, n) => assert(after(k) == n, s"lost rows $k") }
      t.drop()
    }
  }
}
