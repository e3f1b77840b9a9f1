package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the DuckDB oracle gate against the round-13 timeout class.
  *
  * DuckDB inlines every non-MATERIALIZED CTE at each reference site. A
  * chain of CTEs where step i references step i-1 more than once expands
  * multiplicatively — s08's unrolled MMR steps re-inlined the brute-force
  * scoring pass ~15,000× and pushed the sf0.01 gate from 14 s to 431 s
  * (fixed in commit 88b7f7d by marking shared CTEs `AS MATERIALIZED`).
  *
  * This spec computes, for every `SparkEntry.oracleSql` entry, the number
  * of times each CTE body would be inlined (propagating multiplicities
  * through the CTE DAG; MATERIALIZED definitions are cut points evaluated
  * exactly once) and bounds the maximum. The current worst oracle (q47's
  * funnel chain) expands 140×; the failing s08 shape was 15,304×. Any NEW
  * oracle whose chain exceeds the bound must mark the shared CTEs
  * `AS MATERIALIZED` (results are unchanged — only evaluation sharing).
  */
class OracleCteSpec extends AnyFunSuite {

  private val MaxExpansion = 256

  /** (name, materialized, body) for each CTE definition, in order. */
  private def cteDefs(sql: String): Seq[(String, Boolean, String)] = {
    val pat = """(?i)\b(\w+)\s+AS\s+(MATERIALIZED\s+)?\(""".r
    val defs = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, String, Int)]
    var i = 0
    var m = pat.findFirstMatchIn(sql)
    while (m.isDefined) {
      val mm = m.get
      var depth = 1
      var j = i + mm.end
      while (depth > 0 && j < sql.length) {
        if (sql(j) == '(') depth += 1
        else if (sql(j) == ')') depth -= 1
        j += 1
      }
      defs += ((mm.group(1), mm.group(2) != null, sql.substring(i + mm.end, j - 1), j))
      i = j
      m = pat.findFirstMatchIn(sql.substring(i))
    }
    // tail (final SELECT) participates as a pseudo-consumer with mult 1
    val tail = if (defs.isEmpty) sql else sql.substring(defs.last._4)
    defs.toSeq.map { case (n, mat, b, _) => (n, mat, b) } :+ (("", false, tail))
  }

  /** Max inline-expansion count over the oracle's CTE DAG. */
  private def maxExpansion(sql: String): (Int, String) = {
    val defs = cteDefs(sql)
    def refs(name: String, body: String): Int =
      ("""\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
        .findAllIn(body).size
    val expv = scala.collection.mutable.Map.empty[String, Int]
    // the trailing pseudo-def ("" = final SELECT) always has multiplicity 1
    expv("") = 1
    for (k <- defs.indices.reverse.drop(1)) {
      val (name, mat, _) = defs(k)
      val e = defs.drop(k + 1).map { case (n2, mat2, body2) =>
        val mult = if (mat2) 1 else expv.getOrElse(n2, 1)
        refs(name, body2) * mult
      }.sum
      expv(name) = if (mat) 1 else math.max(e, 1)
    }
    val worst = (expv - "").maxByOption(_._2).getOrElse(("", 1))
    (worst._2, worst._1)
  }

  test("no oracle CTE chain expands past the inline-blowup bound") {
    val offenders = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      val (exp, cte) = maxExpansion(sql)
      if (exp > MaxExpansion) Some(f"$name: CTE '$cte' inlined $exp×") else None
    }
    assert(
      offenders.isEmpty,
      s"\nOracle CTE chains past $MaxExpansion inline expansions (mark the " +
        s"shared CTEs AS MATERIALIZED — see scaladoc):\n${offenders.mkString("\n")}")
  }

  test("the expansion metric itself detects the s08 failure shape") {
    // three chained steps, each referencing the previous THREE times:
    // expansion of s0 = 3^3 = 27; materializing s1 caps every CTE at 3
    def chain(mat: String) =
      s"""WITH s0 AS (SELECT 1 AS x),
         |s1 AS $mat(SELECT a.x FROM s0 a, s0 b, s0 c),
         |s2 AS (SELECT a.x FROM s1 a, s1 b, s1 c),
         |s3 AS (SELECT a.x FROM s2 a, s2 b, s2 c)
         |SELECT * FROM s3""".stripMargin
    assert(maxExpansion(chain(""))._1 === 27)
    assert(maxExpansion(chain("MATERIALIZED "))._1 === 3)
  }
}
