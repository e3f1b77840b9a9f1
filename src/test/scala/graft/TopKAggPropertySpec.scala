package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Randomized equivalence for graft_top_k: for seeded random datasets —
  * heavy score ties, NaN scores, empty-ish groups, k larger than some
  * groups — across RANDOM partitionings, the aggregate must equal the
  * window row_number spelling exactly. This is the property the oracle
  * gate relies on (partitioning-independence of the (score DESC, id
  * ASC) total order) and the one a primitive `>` comparator silently
  * broke for NaN before the r9 review fix.
  */
class TopKAggPropertySpec extends SparkSpec {
  import spark.implicits._

  private def run(seed: Int): Unit = {
    val rnd = new Random(seed)
    val n = 200 + rnd.nextInt(800)
    val nGroups = 1 + rnd.nextInt(9)
    val k = 1 + rnd.nextInt(5)
    val rows = (0 until n).map { i =>
      val score =
        if (rnd.nextInt(20) == 0) Double.NaN
        else rnd.nextInt(12).toDouble // few distinct values → many ties
      (rnd.nextInt(nGroups).toLong, score, i.toLong)
    }
    val df = rows.toDF("g", "score", "id")
      .repartition(1 + rnd.nextInt(16))

    GraftFunctions.ensureRegistered(spark)
    val got = df.groupBy($"g")
      .agg(call_function("graft_top_k", $"score", $"id", lit(k)).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rn"), $"col.id".as("id"))
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"score".desc, $"id")))
      .filter($"rn" <= k)
      .select($"g", $"rn".cast("int").as("rn"), $"id")
    val extra = got.except(want).count()
    val missing = want.except(got).count()
    assert(extra == 0 && missing == 0,
      s"seed=$seed k=$k groups=$nGroups: +$extra -$missing vs window")
  }

  test("graft_top_k == window row_number across random data, ties, NaN, partitionings") {
    (1 to 8).foreach(run)
  }
}
