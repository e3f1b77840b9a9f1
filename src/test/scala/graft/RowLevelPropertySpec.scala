package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.meta.GraftTable

/** Property-based invariants for copy-on-write row-level operations:
  * for random tables, thresholds, and upsert sources —
  *   - deleteWhere(cond) leaves exactly the rows where cond is not TRUE
  *     (NULL predicate rows survive, SQL DELETE semantics);
  *   - merge(source, keys) produces exactly
  *     source ∪ (table ∖ keys(source)), with every key unique;
  *   - neither operation disturbs rows in untouched files.
  *
  * Fixed-seed ScalaCheck generators, small case counts (each case runs
  * several Spark jobs).
  */
class RowLevelPropertySpec extends SparkSpec {
  import spark.implicits._

  // (id, v) with nullable v so delete predicates hit the NULL path
  private val rowsGen: Gen[List[(Long, Option[Long])]] =
    Gen.choose(20, 60).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.choose(0L, 500L)
      v <- Gen.option(Gen.choose(0L, 100L))
    } yield (id, v))).map(_.distinctBy(_._1))

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(7L + i)))

  test("deleteWhere complement property (incl. NULL predicates)") {
    cases(rowsGen, 4).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "v")
      val t = GraftTable.create(spark, tmpDir("rlprop") + "/t", df.schema)
      t.append(df.repartitionByRange(4, $"id"))
      val threshold = 20L + i * 15L
      val deleted = t.deleteWhere($"v" < threshold)
      val expectSurvivors = rows.filterNot(_._2.exists(_ < threshold))
      assert(deleted == rows.size - expectSurvivors.size)
      assert(t.read.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet == expectSurvivors.toSet)
      assert(t.rowCount == expectSurvivors.size)
    }
  }

  test("MOR delete complement property: matches CoW semantics exactly") {
    cases(rowsGen, 4).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("id", "v")
      val t = GraftTable.create(spark, tmpDir("morprop") + "/t", df.schema)
      t.append(df.repartitionByRange(4, $"id"))
      val threshold = 20L + i * 15L
      val deleted = t.deleteWhereMOR($"v" < threshold)
      val expectSurvivors = rows.filterNot(_._2.exists(_ < threshold))
      assert(deleted == rows.size - expectSurvivors.size)
      assert(t.read.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet == expectSurvivors.toSet)
      assert(t.rowCount == expectSurvivors.size)
      // materialization preserves the survivors bit-for-bit
      t.optimize()
      assert(t.read.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet == expectSurvivors.toSet)
      assert(t.rowCount == expectSurvivors.size)
    }
  }

  test("eq-upsert property: result == source ∪ (table ∖ source keys)") {
    val srcGen = Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.choose(0L, 500L)
      v <- Gen.option(Gen.choose(500L, 600L))
    } yield (id, v))).map(_.distinctBy(_._1))
    cases(Gen.zip(rowsGen, srcGen), 4).foreach { case (rows, src) =>
      val t = GraftTable.create(spark, tmpDir("equprop") + "/t",
        rows.toDF("id", "v").schema)
      t.append(rows.toDF("id", "v").repartitionByRange(4, $"id"))
      t.upsert(src.toDF("id", "v"), Seq("id"))
      val expect = (src ++ rows.filterNot(r => src.exists(_._1 == r._1))).toSet
      assert(t.read.collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet == expect)
      assert(t.rowCount == expect.size)
      assert(t.read.groupBy("id").count().filter($"count" > 1).count() == 0)
    }
  }

  test("merge upsert property: result == source ∪ (table ∖ source keys)") {
    val srcGen = Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, for {
      id <- Gen.choose(0L, 700L) // overlaps table ids AND new ids
      v <- Gen.choose(1000L, 2000L)
    } yield (id, Some(v): Option[Long])).map(_.distinctBy(_._1)))
    cases(Gen.zip(rowsGen, srcGen), 4).foreach { case (rows, src) =>
      val df = rows.toDF("id", "v")
      val t = GraftTable.create(spark, tmpDir("rlprop") + "/t", df.schema)
      t.append(df.repartitionByRange(4, $"id"))
      t.merge(src.toDF("id", "v"), Seq("id"))
      val srcKeys = src.map(_._1).toSet
      val expect = (src ++ rows.filterNot(r => srcKeys(r._1))).toSet
      val got = t.read.collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      assert(got == expect)
      assert(t.read.groupBy("id").count().filter($"count" > 1).count() == 0,
        "merge must keep keys unique")
    }
  }
}
