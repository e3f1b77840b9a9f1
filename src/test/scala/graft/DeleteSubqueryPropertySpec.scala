package graft

import graft.meta.GraftTable
import graft.sql.GraftSql

/** Property check: `DELETE … WHERE k [NOT] IN (SELECT …)` against the
  * three-valued SQL model computed in plain Scala — random key columns
  * with NULLs, random subquery value sets (empty / with NULLs /
  * null-free), both polarities. The empty-subquery NOT IN case (TRUE
  * for every row, NULL keys included) and the null-poisoned NOT IN
  * no-op both fall out of the model rather than being hand-picked.
  */
class DeleteSubqueryPropertySpec extends SparkSpec {
  import spark.implicits._

  /** SQL three-valued `k IN S`. */
  private def inRes(k: Option[Long], s: Seq[Option[Long]]): Option[Boolean] =
    k match {
      case _ if s.isEmpty => Some(false)
      case None => None
      case Some(x) =>
        if (s.contains(Some(x))) Some(true)
        else if (s.contains(None)) None
        else Some(false)
    }

  test("random tables: engine deletions equal the three-valued model") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val dir = tmpDir(s"delsub$trial")
      val resolve: String => GraftTable =
        n => GraftTable.load(spark, s"$dir/$n")
      val tVals: Seq[Option[Long]] = (0 until 12).map(_ =>
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(6).toLong))
      val sVals: Seq[Option[Long]] = (0 until rnd.nextInt(5)).map(_ =>
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(6).toLong))
      val not = rnd.nextBoolean()

      val tdf = tVals.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "k")
      GraftTable.create(spark, s"$dir/t", tdf.schema).append(tdf)
      val sdf = sVals.toDF("v")
      GraftTable.create(spark, s"$dir/s", sdf.schema).append(sdf)

      GraftSql.exec(spark,
        s"DELETE FROM t WHERE k ${if (not) "NOT " else ""}IN (SELECT v FROM s)",
        resolve)

      // a row is deleted iff the predicate is TRUE (never on UNKNOWN)
      val expect = tVals.zipWithIndex.filterNot { case (k, _) =>
        val r = inRes(k, sVals)
        if (not) r.contains(false) else r.contains(true)
      }.map(_._2.toLong).toSet
      val got = resolve("t").read.select($"id").as[Long].collect().toSet
      assert(got == expect,
        s"trial $trial not=$not t=$tVals s=$sVals got=$got expect=$expect")
    }
  }
}
