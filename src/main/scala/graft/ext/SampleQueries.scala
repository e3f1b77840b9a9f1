package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rel.Tables

/** Deterministic sampling operators for training-data pipelines.
  *
  * Both operators avoid engine random state on purpose: a 100 TB corpus
  * sample must be REPRODUCIBLE (same rows on retry, on another engine,
  * after a repartition) and CHEAP (no global sort, no count-first pass).
  * Keying the sample on a cryptographic hash of a stable id gives both —
  * the same property the exact-dedup and LSH operators already lean on.
  *
  * `sample(fraction)` / TABLESAMPLE are the engine-random alternatives;
  * they cannot be oracle-checked across engines and silently resample on
  * task retry, which is exactly what a lineage-tracked data pipeline
  * must not do.
  */
object SampleQueries {
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Hash-Bernoulli sample: keep a document iff the first hex digit of
    * md5(doc_id) lands in the bucket set — a fixed 2/16 = 12.5% rate
    * here. One codegen'd projection + filter, no shuffle, no state;
    * the sampled id set is a pure function of the ids, so it is stable
    * under retries, engine changes, and table re-clustering. */
  def d06HashSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("bucket", substring(md5($"doc_id".cast("string")), 1, 1))
      .filter($"bucket".isin("0", "1"))
      .select($"doc_id", $"lang", $"source", $"bucket")
      .orderBy($"doc_id")
  }

  /** Stratified sample: a fixed per-language quota (k = 20), chosen in
    * hash-of-id order — deterministic "random" ranking without random
    * state. The window shuffles once on the stratum key; each stratum's
    * top-k is found without sorting the full corpus globally. The
    * standard shape for carving a balanced eval slice out of a skewed
    * corpus (one lang = 90% of docs would dominate a Bernoulli sample). */
  def d07StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byHash = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    docs(s, dir)
      .withColumn("rn", row_number().over(byHash))
      .filter($"rn" <= 20)
      .select($"lang", $"rn".cast("long").as("rn"), $"doc_id")
      .orderBy($"lang", $"rn")
  }

  /** WEIGHTED sampling that APPLIES t10's domain-mix plan: each language
    * keeps documents with probability = its mixing weight (shared code
    * with t10 via [[TextQueries.langWeights]], so the applied weights
    * can never drift from the reported plan — the curation loop closed:
    * cluster/language stats → weights → sampled corpus).
    *
    * The per-document uniform is a Knuth multiplicative hash of the id
    * mapped to [0,1) — exact BIGINT math in both engines, reproducible
    * under retry/repartition like d06's md5 key (which a production
    * pipeline would swap in; the POINT here is the weighted
    * composition). The 5-row weight table BROADCASTS onto the corpus —
    * one scan for the weights, one for the sample, no shuffle by
    * document anywhere. */
  def d15WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = broadcast(TextQueries.langWeights(s, dir)
      .select($"lang", $"weight"))
    docs(s, dir)
      .withColumn("toks", size(split($"text", " ")).cast("long"))
      .withColumn("u",
        (($"doc_id" * 2654435761L) % 4294967296L).cast("double") / 4294967296.0)
      .join(w, "lang")
      .withColumn("keep", $"u" < $"weight")
      .groupBy($"lang")
      .agg(max($"weight").as("weight"),
        count(lit(1)).as("n_docs"),
        count(when($"keep", 1)).as("n_kept"),
        sum(when($"keep", $"toks")).as("kept_tokens"))
      .orderBy($"lang")
  }

  // d17: per-source document cap (binds at every shipped sf)
  private val SourceQuota = 15

  /** PER-SOURCE QUOTA (d17): cap every source at [[SourceQuota]]
    * documents — the Common-Crawl-style per-domain cap that stops one
    * crawler-friendly host from dominating the corpus, the rung of the
    * sampling family between stratified (d07: fixed N per class) and
    * weighted (d15: probabilistic per-class rate). Selection within a
    * source is by hash order (portable md5-prefix of doc_id, doc_id
    * tie-break) — reproducible under retries and re-clustering like
    * d06/d07, and unbiased w.r.t. document position in the crawl. One
    * shuffle by source (bounded groups: the per-source doc list), one
    * report aggregate; at 100 TB the window never sees more than a
    * source's documents in one partition. */
  def d17SourceQuota(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = DedupQueries.h32($"doc_id".cast("string"))
    val w = Window.partitionBy($"source").orderBy(h.asc, $"doc_id".asc)
    docs(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("kept", $"rn" <= SourceQuota)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"kept", 1)).as("n_kept"),
        sum(when($"kept", $"doc_id")).as("kept_id_sum"))
      .orderBy($"lang")
  }

  // d22: export shard count (tens of thousands at 100 TB; 8 binds here)
  private val NumShards = 8
  private val ShuffleSeed = "seed42:"

  /** Deterministic corpus shuffle + balanced shard assignment (d22):
    * the step between a curated corpus and training files. Every doc
    * gets a cryptographic shuffle key md5(seed ‖ doc_id); its SHARD is
    * an integer hash of the same key (uniform in expectation — no
    * count-first pass, no global coordination) and its POSITION is the
    * key-order rank within the shard. Same seed ⇒ byte-identical
    * shards on retry, on another engine, after a re-cluster — which is
    * why the report pins a position-weighted checksum, not just
    * counts. Changing the seed is a full epoch re-shuffle.
    *
    * Scale shape: this IS the physical export plan —
    * `repartition(shard)` + `sortWithinPartitions(key)` + write; the
    * window partitioned by shard ordered by key is that same
    * shuffle+sort expressed relationally (one exchange, each shard
    * sorts independently; no global sort, no single-partition window).
    * At 100 TB the shard count scales with the cluster and each
    * shard's sort is one task's spill-friendly local sort. */
  def d22ShuffleExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = docs(s, dir).select($"doc_id", $"n_chars",
      md5(concat(lit(ShuffleSeed), $"doc_id".cast("string"))).as("k"))
      .withColumn("shard",
        conv(substring($"k", 1, 8), 16, 10).cast("long") % NumShards)
    val w = Window.partitionBy($"shard").orderBy($"k", $"doc_id")
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"k").as("first_key"),
        max($"k").as("last_key"),
        sum($"pos" * ($"doc_id" % 997L)).as("order_checksum"))
      .orderBy($"shard")
  }

  // d23: target mix by language (basis points, sums to 10000) and the
  // token budget as a fraction of the corpus (half of it here)
  private val MixRecipe: Seq[(String, Long)] =
    Seq("en" -> 4000L, "zh" -> 2000L, "de" -> 1500L, "fr" -> 1500L,
      "es" -> 1000L)
  private val MixBudgetBp = 5000L

  /** Data-mixing recipe planner + applier (d23): given a DECLARED
    * target distribution over languages and a total character budget,
    * compute each language's sampling rate capped by availability
    * (`min(1, target/avail)` — you cannot sample what is not there),
    * apply it as a deterministic hash-Bernoulli keep, and report
    * plan-vs-actual per language including the shortfall an
    * under-supplied language leaves unfilled. This is the DoReMi/Dolma
    *-style mixture step where a training run pins "40% en, 20% zh, …"
    * against a crawl whose natural mix is different; d15 applies
    * weights DERIVED from the corpus itself, d23 solves for rates
    * against an EXTERNAL recipe — the planner in front of the sampler.
    *
    * Scale shape: availability is one partial-combining aggregate
    * (|langs| rows); the 5-row plan BROADCASTS back onto the corpus
    * scan, so applying the recipe is a second linear pass with no
    * corpus shuffle at all; the report aggregate is |langs|-sized.
    * Everything is fixed-point (chars BIGINT, rates in basis points,
    * the keep decision an integer congruence) — byte-reproducible
    * across engines and retries. */
  def d23MixRecipe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val avail = d.groupBy($"lang")
      .agg(sum($"n_chars").as("avail_chars"), count(lit(1)).as("avail_docs"))
    val tot = d.agg(sum($"n_chars").as("total_chars"))
    val recipe = MixRecipe.toDF("lang", "share_bp")
    val plan = avail.join(broadcast(recipe), Seq("lang"))
      .crossJoin(broadcast(tot))
      .withColumn("target_chars",
        expr(s"(total_chars * $MixBudgetBp div 10000) * share_bp div 10000"))
      .withColumn("rate_bp",
        least(lit(10000L), expr("target_chars * 10000 div avail_chars")))
    val sampled = d
      .withColumn("u_bp", ($"doc_id" * 1103515245L + 12345L) % 10000L)
      .join(broadcast(plan.select($"lang", $"rate_bp")), Seq("lang"))
      .filter($"u_bp" < $"rate_bp")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"), sum($"n_chars").as("sampled_chars"))
    plan.join(sampled, Seq("lang"), "left")
      .select($"lang", $"share_bp", $"avail_chars", $"target_chars",
        $"rate_bp",
        coalesce($"n_sampled", lit(0L)).as("n_sampled"),
        coalesce($"sampled_chars", lit(0L)).as("sampled_chars"),
        greatest(lit(0L), $"target_chars" - $"avail_chars")
          .as("shortfall_chars"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d22_shuffle_export" -> (d22ShuffleExport _),
    "d23_mix_recipe" -> (d23MixRecipe _),
    "d06_hash_sample" -> (d06HashSample _),
    "d07_stratified_sample" -> (d07StratifiedSample _),
    "d15_weighted_sample" -> (d15WeightedSample _),
    "d17_source_quota" -> (d17SourceQuota _),
  )

  val oracles: Map[String, String] = Map(
    "d22_shuffle_export" ->
      s"""WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    md5('$ShuffleSeed' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents),
        |sh AS (
        |  SELECT *, ('0x' || substring(k, 1, 8))::BIGINT % $NumShards
        |    AS shard FROM keyed),
        |p AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard
        |    ORDER BY k, doc_id) AS pos FROM sh)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(k) AS first_key, max(k) AS last_key,
        |  CAST(sum(pos * (doc_id % 997)) AS BIGINT) AS order_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    "d23_mix_recipe" -> {
      val recipeValues = MixRecipe
        .map { case (l, bp) => s"('$l', ${bp}::BIGINT)" }.mkString(", ")
      s"""WITH recipe(lang, share_bp) AS (VALUES $recipeValues),
        |avail AS (
        |  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS avail_chars
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents),
        |plan AS (
        |  SELECT a.lang, r.share_bp, a.avail_chars,
        |    CAST((tot.total_chars * $MixBudgetBp // 10000) * r.share_bp
        |      // 10000 AS BIGINT) AS target_chars
        |  FROM avail a JOIN recipe r ON a.lang = r.lang CROSS JOIN tot),
        |plan2 AS (
        |  SELECT *, CAST(least(10000, target_chars * 10000 // avail_chars)
        |    AS BIGINT) AS rate_bp FROM plan),
        |sampled AS (
        |  SELECT d.lang, count(*) AS n_sampled,
        |    CAST(sum(d.n_chars) AS BIGINT) AS sampled_chars
        |  FROM documents d JOIN plan2 p ON d.lang = p.lang
        |  WHERE (d.doc_id * 1103515245 + 12345) % 10000 < p.rate_bp
        |  GROUP BY d.lang)
        |SELECT p.lang, p.share_bp, p.avail_chars, p.target_chars,
        |  p.rate_bp,
        |  coalesce(s.n_sampled, 0) AS n_sampled,
        |  coalesce(s.sampled_chars, 0) AS sampled_chars,
        |  CAST(greatest(0, p.target_chars - p.avail_chars) AS BIGINT)
        |    AS shortfall_chars
        |FROM plan2 p LEFT JOIN sampled s ON p.lang = s.lang
        |ORDER BY p.lang""".stripMargin
    },
    "d17_source_quota" ->
      s"""WITH r AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
        |               doc_id) AS rn
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN rn <= $SourceQuota THEN 1 END) AS n_kept,
        |  CAST(sum(CASE WHEN rn <= $SourceQuota THEN doc_id END) AS BIGINT)
        |    AS kept_id_sum
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "d06_hash_sample" ->
      """SELECT doc_id, lang, source,
        |  substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin,
    "d07_stratified_sample" ->
      """SELECT lang, rn, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20
        |ORDER BY lang, rn""".stripMargin,
    "d15_weighted_sample" ->
      s"""WITH p AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT sum(actual_tokens)::DOUBLE AS total_tokens FROM p),
        |w AS (SELECT lang,
        |    round(least(1.0, (total_tokens * ${TextQueries.TargetShare}) / actual_tokens), 6) AS weight
        |  FROM p, tot),
        |d AS (
        |  SELECT lang, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
        |    CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM documents)
        |SELECT d.lang, max(w.weight) AS weight, count(*) AS n_docs,
        |  CAST(count(CASE WHEN u < weight THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN u < weight THEN toks END) AS BIGINT) AS kept_tokens
        |FROM d JOIN w ON d.lang = w.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
  )
}
