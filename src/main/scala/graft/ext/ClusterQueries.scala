package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rel.Tables

/** Topic CLUSTERING over the embedding corpus: deterministic spherical
  * k-means (Lloyd iterations with cosine assignment), the corpus
  * organization step between near-dup removal and domain mixing in an
  * LLM data pipeline (cluster → inspect → reweight/drop).
  *
  * Determinism contract (what makes a DuckDB oracle possible at all):
  * fixed init (the K lowest vec_ids), a FIXED iteration count,
  * per-coordinate centroid means rounded to [[CentroidDp]] dp after
  * every update (so the two engines' order-of-summation drift cannot
  * propagate), similarities rounded to 6 dp with cid tie-breaks before
  * every argmax. Dot products are left-to-right folds over ascending
  * dimensions in both engines — bit-identical doubles (the
  * driver-side centroid norm is the same left-to-right fold).
  *
  * Scale shape: centroids are K×dim doubles — bounded METADATA, like
  * s02's probe cells — collected to the driver each round and baked
  * into the next assignment as literal arrays. Assignment is therefore
  * a PURE PROJECTION over the corpus: no join, no shuffle, argmax as a
  * greatest+CASE chain inside whole-stage codegen. The only wide
  * stages are the centroid updates — one hash-aggregate per iteration
  * whose reduce side is K×dim rows after map-side partial aggregation.
  * The corpus is scanned `iterations + 1` times and never shuffled by
  * row — the classic distributed-Lloyd plan at 100 TB.
  */
object ClusterQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val K = 8
  private val Iters = 2
  private val Dim = 64
  private val CentroidDp = 5

  /** left-to-right fold dot of the float vector column with a literal
    * double centroid — a projection, nothing broadcast or joined. The
    * fused graft_fddot expression replaces the zip_with+aggregate fold
    * (identical accumulation order and null/ragged semantics, one
    * codegen loop instead of interpreted per-element lambdas — r18,
    * guide §4: the assignment projection evaluates this K times per
    * row, every Lloyd round). */
  private def dotLit(a: Column, ce: Seq[Double]): Column =
    call_function("graft_fddot", a, array(ce.map(lit): _*))

  /** cosine argmax assignment against driver-held centroids, as one
    * projection: per-centroid sim columns, `greatest` for the max, and
    * a first-match CASE chain in ascending cid order (= ties to the
    * LOWEST cid, matching the oracle's `ORDER BY sim DESC, cid`). */
  private def assign(e: DataFrame,
                     cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val sorted = cents.sortBy(_._1)
    val simCols = sorted.map { case (cid, ce) =>
      // same left-to-right sum-of-squares fold as the oracle's list_sum
      val cn = math.sqrt(ce.foldLeft(0.0)((acc, x) => acc + x * x))
      round(dotLit($"embedding", ce) / ($"nrm" * cn), 6).as(s"sim_$cid")
    }
    val withSims = e.select(
      ($"vec_id" +: $"label" +: $"embedding" +: $"nrm" +: simCols): _*)
    val mx = sorted.map { case (cid, _) => col(s"sim_$cid") }
      .reduce((a, b) => greatest(a, b))
    val cid = sorted.reverse.foldLeft(lit(-1L)) { case (alt, (c, _)) =>
      when(col(s"sim_$c") === mx, lit(c)).otherwise(alt)
    }
    withSims.withColumn("cid", cid)
      .select($"vec_id", $"label", $"embedding", $"nrm", $"cid")
  }

  /** centroid update: per-(cid, dimension) mean, rounded, re-assembled
    * into ordered double arrays and collected (K×dim — bounded).
    * Map-side partial avg keeps the shuffle at K×dim rows regardless
    * of corpus size. */
  private def update(assigned: DataFrame): Seq[(Long, Seq[Double])] = {
    val s = assigned.sparkSession
    import s.implicits._
    assigned
      .select($"cid", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"cid", $"pos")
      .agg(round(avg($"v".cast("double")), CentroidDp).as("cv"))
      .groupBy($"cid")
      .agg(transform(array_sort(collect_list(struct($"pos", $"cv"))),
        p => p("cv")).as("ce"))
      .as[(Long, Seq[Double])].collect().toSeq
  }

  /** K-means topic clusters: K=[[K]], [[Iters]] Lloyd iterations, then a
    * final assignment summarized per cluster — size, vec_id range, and
    * the modal `label` (ties to the lowest label), the purity signal a
    * curation pass reads. */
  def d13KmeansTopics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cached: the normalized vector relation is scanned Iters+1 times
    // per call (every Lloyd round re-reads it) and again on every
    // bench pass — one persisted copy serves them all
    graft.functions.GraftFunctions.ensureRegistered(s)
    val e = RelCache.cached(s, s"$dir#d13_e") {
      // Σx² as the fused self-dot — same left-to-right double fold as
      // the transform+aggregate it replaces (r18, guide §4)
      t(s, dir, "embeddings")
        .select($"vec_id", $"label", $"embedding")
        .withColumn("nrm",
          sqrt(call_function("graft_fdot", $"embedding", $"embedding")))
    }
    // init = the K LOWEST vec_ids (not `vec_id < K`: ids need not start
    // at 0); K×dim doubles — a bounded driver-side collect
    var cents: Seq[(Long, Seq[Double])] = e.orderBy($"vec_id").limit(K)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("ce"))
      .as[(Long, Seq[Double])].collect().toSeq
    // The DuckDB oracle unrolls range(1, Dim+1) with a HARD-CODED Dim;
    // the Spark side adapts to the actual vector length. Fail loudly on
    // a fixture dimension change instead of hash-mismatching confusingly.
    cents.find(_._2.length != Dim).foreach(c => throw new IllegalStateException(
      s"d13 oracle assumes $Dim-dim embeddings; fixture vec ${c._1} has ${c._2.length}"))
    for (_ <- 0 until Iters) cents = update(assign(e, cents))
    val fin = assign(e, cents)
    val sizes = fin.groupBy($"cid")
      .agg(count(lit(1)).as("n_members"),
        min($"vec_id").as("first_vec"), max($"vec_id").as("last_vec"))
    val wLab = Window.partitionBy($"cid").orderBy($"n".desc, $"label")
    val topLabel = fin.groupBy($"cid", $"label")
      .agg(count(lit(1)).as("n"))
      .withColumn("lrn", row_number().over(wLab))
      .filter($"lrn" === 1)
      .select($"cid", $"label".as("top_label"), $"n".as("top_label_n"))
    sizes.join(topLabel, Seq("cid"))
      .select($"cid".as("cluster_id"), $"n_members", $"first_vec",
        $"last_vec", $"top_label", $"top_label_n")
      .orderBy($"cluster_id")
  }

  private val RankScale = 1000000000000L // 1e12 fixed-point rank unit
  private val RankIters = 3
  private val RankOutDeg = 3

  /** Fixed-point PageRank over a deterministic link graph (d19):
    * document/domain authority scoring — the crawl-quality weighting
    * signal (OPIC/PageRank-weighted sampling) between dedup and domain
    * mixing in a web-scale curation pipeline. Links are synthesized
    * (v = h32(u:k) mod N, self-loops dropped, parallel edges deduped)
    * because the corpus has no real hyperlinks; the operator is
    * edge-list-agnostic.
    *
    * Determinism across engines is ABSOLUTE, not rounded: ranks are
    * 64-bit fixed-point integers and every divide is integral
    * (`div` / DuckDB `//`), so there is NO float summation order to
    * disagree about — the stronger form of d13's per-round rounding
    * contract. Dangling nodes (none in practice with 3 out-links) would
    * simply not contribute, the standard simplification.
    *
    * Scale shape: each iteration is ONE equi-join of the O(nodes) rank
    * relation against the cached edge list (shuffled by src) plus one
    * hash-aggregate by dst — the d09 bounded-rounds plan. Ranks never
    * collect to the driver; the final key filter cuts the OUTPUT, not
    * the computation (rank needs the whole graph). */
  def d19LinkRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents").select($"doc_id")
    val nRow = docs.agg(count(lit(1)).as("n"))
    // nodes, edges, and out-degrees are each referenced once PER
    // ITERATION — cached, so one run scans the documents file once
    // instead of once per join that re-embeds this lineage
    val nodes = RelCache.cached(s, s"$dir#d19_nodes") {
      docs.select($"doc_id".as("node")).crossJoin(broadcast(nRow))
    }
    val edges = RelCache.cached(s, s"$dir#d19_edges") {
      DedupQueries.hashedPartners(
          docs.select($"doc_id".as("u")), "u", RankOutDeg, nRow)
        .select($"u", $"partner".as("v")).distinct()
    }
    val deg = RelCache.cached(s, s"$dir#d19_deg") {
      edges.groupBy($"u").agg(count(lit(1)).as("deg"))
    }
    var ranks = nodes.select($"node", expr(s"${RankScale}L div n").as("r"))
    for (_ <- 1 to RankIters) {
      val contrib = edges.join(deg, "u")
        .join(ranks.withColumnRenamed("node", "u"), "u")
        .select($"v".as("node"), expr("r div deg").as("c"))
      val sums = contrib.groupBy($"node").agg(sum($"c").as("sc"))
      ranks = nodes
        .join(sums, Seq("node"), "left")
        .select($"node",
          expr(s"(${RankScale / 100 * 15}L div n) + " +
            "(85 * coalesce(sc, 0L)) div 100").as("r"))
    }
    ranks.join(deg.withColumnRenamed("u", "node"), Seq("node"), "left")
      .filter($"node" % 97 === 0)
      .select($"node", coalesce($"deg", lit(0L)).as("out_deg"),
        $"r".as("rank_fp"))
      .orderBy($"node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d13_kmeans_topics" -> (d13KmeansTopics _),
    "d19_link_rank" -> (d19LinkRank _),
  )

  // ---- oracle SQL (DuckDB): the same fixed-iteration pipeline, CTEs
  // unrolled per Lloyd round ----

  private val dotSql =
    "list_sum(list_apply(list_zip(%s, %s), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"

  private def assignCte(prev: String, out: String): String =
    s"""${out}n AS (
      |  SELECT cid, ce, sqrt(list_sum(list_apply(ce, x -> x * x))) AS cn
      |  FROM $prev),
      |$out AS (
      |  SELECT vec_id, label, embedding, nrm, cid FROM (
      |    SELECT e.vec_id, e.label, e.embedding, e.nrm, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        round(${dotSql.format("e.embedding", "c.ce")} / (e.nrm * c.cn), 6)
      |          DESC, c.cid) AS rn
      |    FROM e, ${out}n c) WHERE rn = 1)""".stripMargin

  private def updateCte(prev: String, out: String): String =
    s"""${out}u AS (
      |  SELECT cid, i,
      |    round(avg(CAST(embedding[i] AS DOUBLE)), $CentroidDp) AS cv
      |  FROM $prev, range(1, ${Dim + 1}) r(i) GROUP BY cid, i),
      |$out AS (SELECT cid, list(cv ORDER BY i) AS ce FROM ${out}u GROUP BY cid)""".stripMargin

  val oracles: Map[String, String] = Map(
    // same fixed-point integer arithmetic, iterations unrolled as CTEs;
    // HUGEINT intermediates collapse back to BIGINT at the end
    "d19_link_rank" -> {
      val iters = (1 to RankIters).map { i =>
        val prev = s"r${i - 1}"
        s"""c$i AS (
          |  SELECT e.v AS node, sum(r.r // d.deg) AS sc
          |  FROM edges e JOIN deg d USING (u) JOIN $prev r ON r.node = e.u
          |  GROUP BY e.v),
          |r$i AS MATERIALIZED (
          |  SELECT nodes.node,
          |    (${RankScale / 100 * 15} // nn.n)
          |      + (85 * coalesce(c$i.sc, 0)) // 100 AS r
          |  FROM nodes CROSS JOIN nn LEFT JOIN c$i USING (node))"""
      }.mkString(",\n")
      val last = s"r$RankIters"
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |nodes AS (SELECT doc_id AS node FROM documents),
        |e0 AS (
        |  SELECT u,
        |    ('0x' || substring(md5(u::VARCHAR || ':' || k::VARCHAR), 1, 8))::BIGINT
        |      % nn.n AS v
        |  FROM (SELECT doc_id AS u,
        |        unnest([${(1 to RankOutDeg).mkString(", ")}]) AS k
        |        FROM documents)
        |  CROSS JOIN nn),
        |edges AS MATERIALIZED (SELECT DISTINCT u, v FROM e0 WHERE v <> u),
        |deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM edges GROUP BY u),
        |r0 AS MATERIALIZED (SELECT node, ($RankScale // nn.n) AS r
        |       FROM nodes CROSS JOIN nn),
        |$iters
        |SELECT $last.node, CAST(coalesce(deg.deg, 0) AS BIGINT) AS out_deg,
        |  CAST($last.r AS BIGINT) AS rank_fp
        |FROM $last LEFT JOIN deg ON $last.node = deg.u
        |WHERE $last.node % 97 = 0
        |ORDER BY node""".stripMargin
    },
    "d13_kmeans_topics" -> {
      val rounds = (0 until Iters).map { i =>
        assignCte(s"c$i", s"a$i") + ",\n        |" + updateCte(s"a$i", s"c${i + 1}")
      }.mkString(",\n        |")
      s"""WITH e AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_apply(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |c0 AS (
        |  SELECT vec_id AS cid,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $K)),
        |$rounds,
        |${assignCte(s"c$Iters", "fin")},
        |sizes AS (
        |  SELECT cid, count(*) AS n_members, min(vec_id) AS first_vec,
        |    max(vec_id) AS last_vec
        |  FROM fin GROUP BY cid),
        |lab AS (SELECT cid, label, count(*) AS n FROM fin GROUP BY cid, label),
        |topl AS (
        |  SELECT cid, label AS top_label, n AS top_label_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cid
        |                                 ORDER BY n DESC, label) AS lrn
        |    FROM lab) WHERE lrn = 1)
        |SELECT s.cid AS cluster_id, n_members, first_vec, last_vec,
        |  top_label, CAST(top_label_n AS BIGINT) AS top_label_n
        |FROM sizes s JOIN topl USING (cid) ORDER BY cluster_id""".stripMargin
    },
  )
}
