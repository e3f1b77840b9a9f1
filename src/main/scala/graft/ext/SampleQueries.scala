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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d06_hash_sample" -> (d06HashSample _),
    "d07_stratified_sample" -> (d07StratifiedSample _),
  )

  val oracles: Map[String, String] = Map(
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
  )
}
