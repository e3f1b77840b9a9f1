package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.rel.Tables

/** Text-analysis operators for an LLM training-data pipeline
  * (builder-prompt extension set): language-ID (marker-word heuristic),
  * quality scoring, token counting, document fingerprinting.
  *
  * All computations stay inside whole-stage-codegen'd built-ins
  * (split / higher-order filter / regexp) — no UDFs — so the plan
  * scales linearly over documents and parallelizes per input split.
  */
object TextQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Portable 32-bit hash: first 8 hex chars of md5 as a long —
    * identical in DuckDB as `('0x' || substring(md5(x), 1, 8))::BIGINT`
    * (the d19 convention). Delegates to the ONE canonical definition
    * ([[DedupQueries.h32]]): t14, t26, and t27 all hash with this and
    * their oracles mirror it; a divergent copy would silently break an
    * entry's Spark/oracle parity. */
  private def h32(c: Column): Column = DedupQueries.h32(c)

  /** marker words per language for the n-gram/stopword language-ID
    * heuristic; scores are occurrence counts of each language's markers. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "row"),
    "de" -> Seq("data", "table", "hash"),
    "zh" -> Seq("big", "small", "window"),
    "fr" -> Seq("query", "join", "line"),
    "es" -> Seq("fast", "slow", "batch"))

  private def markerScore(words: Column, ws: Seq[String]): Column =
    size(filter(words, w => ws.map(m => w === m).reduce(_ || _)))

  /** Language-ID: argmax of marker scores (ties broken in fixed language
    * order), reported as a confusion matrix against the labeled lang. */
  def t01LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = split($"text", " ")
    val scored = t(s, dir, "documents")
      .withColumn("words", words)
      .select(($"doc_id" +: $"lang" +:
        markers.map { case (l, ws) => markerScore($"words", ws).as(s"s_$l") }): _*)
    val mx = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    // first-match CASE chain = fixed-order tie-break, mirrored in the oracle
    val predFirst = markers.map { case (l, _) => (l, col(s"s_$l") === mx) }
      .reverse.foldLeft(lit("??")) { case (alt, (l, cond)) =>
        when(cond, lit(l)).otherwise(alt)
      }
    scored
      .withColumn("pred_lang", predFirst)
      .groupBy($"lang", $"pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"pred_lang")
  }

  /** Quality scoring: word/char ratios per document, aggregated by lang. */
  def t02QualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a")
    val d = t(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words").cast("long"))
      .withColumn("n_stop",
        size(filter($"words", w => stop.map(m => w === m).reduce(_ || _))).cast("long"))
      .withColumn("avg_word_len",
        (length($"text") - $"n_words" + 1).cast("double") / $"n_words")
      .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_words")
      .withColumn("quality",
        round(lit(1.0) / (lit(1.0) + exp(-($"avg_word_len" - lit(4.0)))) *
          (lit(1.0) - $"stop_ratio"), 6))
    d.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"n_words"), 6).as("avg_n_words"),
        round(avg($"stop_ratio"), 6).as("avg_stop_ratio"),
        round(avg($"quality"), 6).as("avg_quality"),
        count(when($"quality" < 0.4, 1)).as("n_low_quality"))
      .orderBy($"lang")
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens. */
  def t03TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("ws_tokens", size(split($"text", " ")).cast("long"))
      .withColumn("bpe_tokens",
        size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|\\S"), lit(0))).cast("long"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"ws_tokens").as("total_ws_tokens"),
        sum($"bpe_tokens").as("total_bpe_tokens"),
        round(avg($"bpe_tokens"), 6).as("avg_bpe_tokens"))
      .orderBy($"source")
  }

  /** Document fingerprinting: md5 of the whitespace-normalized, lowercased
    * text (canonical-form hash — equal fingerprints = exact near-identical). */
  def t04Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        md5(trim(regexp_replace(lower($"text"), " +", " "))).as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** The composed training-data prep pipeline, end to end in ONE plan:
    * canonical-fingerprint dedup (keep lowest doc_id per fingerprint) →
    * quality gate (t02's score ≥ 0.4) → per-(lang, source) corpus
    * summary with BPE-ish token totals. One shuffle for the dedup
    * window, one for the final aggregate; every step is the exact
    * operator the standalone queries t02-t04 verify individually. */
  def t05PrepPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = Seq("the", "a")
    val d = t(s, dir, "documents")
      .withColumn("fingerprint",
        md5(trim(regexp_replace(lower($"text"), " +", " "))))
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words").cast("long"))
      .withColumn("n_stop",
        size(filter($"words", w => stop.map(m => w === m).reduce(_ || _))).cast("long"))
      .withColumn("avg_word_len",
        (length($"text") - $"n_words" + 1).cast("double") / $"n_words")
      .withColumn("quality",
        round(lit(1.0) / (lit(1.0) + exp(-($"avg_word_len" - lit(4.0)))) *
          (lit(1.0) - $"n_stop".cast("double") / $"n_words"), 6))
    val perFp = org.apache.spark.sql.expressions.Window
      .partitionBy($"fingerprint").orderBy($"doc_id")
    d.withColumn("rn", row_number().over(perFp)).filter($"rn" === 1)
      .filter($"quality" >= 0.4)
      .withColumn("bpe_tokens",
        size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|\\S"), lit(0)))
          .cast("long"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"bpe_tokens").as("total_tokens"),
        round(avg($"quality"), 4).as("avg_quality"))
      .orderBy($"lang", $"source")
  }

  /** BM25 keyword retrieval terms and parameters (Robertson/Spärck
    * Jones; k1/b are the standard defaults). Fixed query terms, mirrored
    * verbatim in the oracle. */
  private val bm25Terms = Seq("hash", "join", "window")
  private val bm25K1 = 1.2
  private val bm25B = 0.75

  /** BM25 keyword search: score every document against a fixed term set
    * and return the top 20 (score DESC, doc_id tie-break). Plan shape:
    * per-document term frequencies are a pure projection over one scan;
    * corpus statistics (N, avgdl, per-term document frequency) are ONE
    * single-row aggregate broadcast back onto the scored rows; the
    * top-k is TakeOrdered, never a full sort. Scales as one pass over
    * the corpus plus a constant-size broadcast — the retrieval shape a
    * 100 TB corpus needs. */
  def t07Bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .withColumn("dl", size($"words").cast("double"))
      .select(($"doc_id" +: $"dl" +: bm25Terms.zipWithIndex.map {
        case (tm, i) =>
          size(filter($"words", w => w === tm)).cast("double").as(s"tf_$i")
      }): _*)
    val statExprs =
      count(lit(1)).cast("double").as("n_docs") +:
        avg($"dl").as("avgdl") +:
        bm25Terms.indices.map(i =>
          count(when(col(s"tf_$i") > 0, 1)).cast("double").as(s"df_$i"))
    val stats = d.agg(statExprs.head, statExprs.tail: _*)
    val score = bm25Terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val df = col(s"df_$i")
      val idf = log(($"n_docs" - df + 0.5) / (df + 0.5) + 1)
      idf * (tf * (bm25K1 + 1)) /
        (tf + lit(bm25K1) * (lit(1 - bm25B) + lit(bm25B) * $"dl" / $"avgdl"))
    }.reduce(_ + _)
    d.crossJoin(broadcast(stats))
      .select($"doc_id", round(score, 6).as("bm25"))
      .orderBy($"bm25".desc, $"doc_id")
      .limit(20)
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021, "Scaling
    * Language Models" §A1.1 public heuristics, rescaled to this corpus):
    * a document passes iff word count, mean word length, stopword
    * count, and word-repetition ratio all land in their accepted
    * ranges. Reported per (lang, source) with per-rule failure tallies
    * — the shape a corpus-curation dashboard consumes. Entirely
    * codegen'd built-ins over one scan; one aggregation shuffle. */
  def t06GopherFilters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words").cast("long"))
      .withColumn("mean_word_len",
        (length($"text") - $"n_words" + 1).cast("double") / $"n_words")
      .withColumn("n_stop",
        size(filter($"words", w => w === "the" || w === "a")).cast("long"))
      .withColumn("distinct_ratio",
        size(array_distinct($"words")).cast("double") / $"n_words")
      .withColumn("ok_len", $"n_words" >= 20 && $"n_words" <= 1000)
      .withColumn("ok_wordlen", $"mean_word_len" >= 4.2 && $"mean_word_len" <= 10.0)
      .withColumn("ok_stop", $"n_stop" >= 2)
      .withColumn("ok_rep", $"distinct_ratio" >= 0.3)
    d.groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when($"ok_len" && $"ok_wordlen" && $"ok_stop" && $"ok_rep", 1))
          .as("n_pass"),
        count(when(!$"ok_len", 1)).as("n_fail_wordcount"),
        count(when(!$"ok_wordlen", 1)).as("n_fail_wordlen"),
        count(when(!$"ok_stop", 1)).as("n_fail_stop"),
        count(when(!$"ok_rep", 1)).as("n_fail_repetition"))
      .orderBy($"lang", $"source")
  }

  /** Sequence PACKING: concatenate-and-chunk documents into fixed
    * context windows (2048 "tokens" = whitespace words), the layout a
    * pretraining dataloader consumes. Deterministic chunked
    * concatenation: docs ordered by doc_id within each (lang, source)
    * shard, each doc assigned to the window its first token lands in
    * (floor(preceding-tokens / window)).
    *
    * Packing within shards — not one global order — is the 100 TB
    * shape: the running sum is a window function PARTITIONED by shard,
    * so every shard packs in parallel and no global single-partition
    * sort exists anywhere in the plan. */
  def t08SequencePacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val win = 2048L
    val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .withColumn("toks", size(split($"text", " ")).cast("long"))
      .withColumn("start_off", sum($"toks").over(w) - $"toks")
      .withColumn("chunk", floor($"start_off" / win))
      .groupBy($"lang", $"source", $"chunk")
      .agg(count(lit(1)).as("n_docs"),
        sum($"toks").as("total_tokens"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"source", $"chunk")
  }

  /** Terms the scrub removes (C4-style blocklist filtering; a real
    * pipeline loads the badword list from config — fixed here and
    * mirrored verbatim in the oracle). */
  private val blocklist = Seq("customer", "vector", "dup")

  private def blocked(w: Column): Column =
    blocklist.map(b => w === b).reduce(_ || _)

  /** BLOCKLIST scrub (C4 §2.1 shape): remove blocklisted tokens from
    * every document and report, per source, how much was redacted —
    * documents touched, tokens removed, token/char counts before and
    * after. Pure projection + one aggregation shuffle; the blocklist is
    * a baked-in predicate (at 100 TB scale a larger list would compile
    * to the same codegen'd OR-chain or a broadcast hash probe), so the
    * corpus is scanned exactly once and never shuffles by token. */
  def t09BlocklistScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .withColumn("n_words", size($"words").cast("long"))
      .withColumn("n_hits", size(filter($"words", blocked(_))).cast("long"))
      .withColumn("chars_after",
        aggregate(filter($"words", w => !blocked(w)), lit(0L),
          (a, x) => a + length(x)))
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"n_hits" > 0, 1)).as("n_docs_hit"),
        sum($"n_hits").as("total_redactions"),
        sum($"n_words").as("tokens_before"),
        sum($"n_words" - $"n_hits").as("tokens_after"),
        sum($"chars_after").as("chars_after"))
      .orderBy($"source")
  }

  // PII redaction patterns (C4/CCNet-style scrub). Chosen to mean the
  // same thing in Java regex (Spark codegen) and RE2 (DuckDB oracle):
  // char classes, bounded repetition, \b — no lookarounds.
  private[ext] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ext] val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private[ext] val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII REDACTION (the C4/CCNet scrub beside t09's blocklist): mask
    * emails, phone numbers, and IPs via built-in `regexp_count` /
    * `regexp_replace` — codegen'd, no UDF — and report per source how
    * many documents and spans were touched plus the net character
    * delta. The fixture corpus is clean word soup, so the query first
    * INJECTS deterministic PII spans keyed on doc_id (same construction
    * in the oracle); the redaction math is then fully hash-checked.
    * One corpus scan, one aggregation exchange by source — same 100 TB
    * shape as t09; patterns are literals compiled once per task. */
  def t11PiiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val id = $"doc_id".cast("string")
    val raw = concat($"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" reach me at user"), id, lit("@example.com")))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" call 555-"),
          lpad(($"doc_id" % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((($"doc_id" * 7) % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 7 === 0,
        concat(lit(" from 10.0."), ($"doc_id" % 256).cast("string"),
          lit("."), (($"doc_id" * 3) % 256).cast("string")))
        .otherwise(lit("")))
    val d = t(s, dir, "documents")
      .withColumn("raw", raw)
      .withColumn("n_email", regexp_count($"raw", lit(EmailRe)).cast("long"))
      .withColumn("n_phone", regexp_count($"raw", lit(PhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count($"raw", lit(IpRe)).cast("long"))
      .withColumn("clean", regexp_replace(regexp_replace(regexp_replace(
        $"raw", EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>"))
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"n_email" + $"n_phone" + $"n_ip" > 0, 1))
          .as("docs_with_pii"),
        sum($"n_email").as("emails_redacted"),
        sum($"n_phone").as("phones_redacted"),
        sum($"n_ip").as("ips_redacted"),
        sum(length($"raw") - length($"clean")).as("chars_delta"))
      .orderBy($"source")
  }

  // t13: broadcast vocabulary size and the OOV-share flag threshold
  private val TopVocab = 50

  /** UNIGRAM RARITY scoring (t13) — the CCNet/LM quality-filter shape
    * without an external model: score every document by the mean
    * inverse corpus probability of its words and flag OOV-heavy docs.
    * All arithmetic is INTEGER (per-word weight = `total div count`,
    * OOV = `2·total`), so scores agree bit-for-bit across engines and
    * group aggregation is order-free — no float-summation drift to
    * manage. (BIGINT bounds the per-language sum; a corpus whose rarity
    * sums approach 2^63 would need the weights rescaled, not a wider
    * type — the SCORE is a ratio signal, not a count.)
    *
    * Scale shape: ONE shuffle counts the vocabulary (unavoidable and
    * linear); the top-[[TopVocab]] table is bounded METADATA collected
    * to the driver (like d13's centroids) and baked into the scoring
    * pass as a literal map — scoring is a pure projection, the corpus
    * never shuffles by word, and a 100 TB corpus pays one count pass
    * plus one scoring pass. */
  def t13RarityFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persist the counted vocabulary so the total and the top-K come
    // from ONE corpus scan + ONE word shuffle (two uncached actions
    // would re-run both — the exact cost this operator exists to avoid)
    val vc = t(s, dir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
      .persist()
    val (total, top) = try {
      val totalRow = vc.agg(sum($"c")).head()
      val tot = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      // deterministic top-K: count DESC, word ASC — bounded driver collect
      (tot, vc.orderBy($"c".desc, $"word").limit(TopVocab).collect())
    } finally vc.unpersist()
    val invMap =
      if (top.isEmpty) typedLit(Map.empty[String, Long])
      else map(top.toSeq.flatMap(r =>
        Seq(lit(r.getString(0)), lit(total / r.getLong(1)))): _*)
    val oov = lit(2L * total)
    val d = t(s, dir, "documents")
      .withColumn("ws", split($"text", " "))
      .withColumn("n_words", size($"ws").cast("long"))
      .withColumn("rarity", aggregate($"ws", lit(0L),
        (a, x) => a + coalesce(element_at(invMap, x), oov)))
      .withColumn("n_oov",
        size(filter($"ws", x => element_at(invMap, x).isNull)).cast("long"))
    d.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        // flagged: more than 10% of tokens outside the top vocabulary
        count(when($"n_oov" * 10 > $"n_words", 1)).as("n_flagged"),
        sum($"rarity").as("sum_rarity"),
        min($"rarity").as("min_rarity"), max($"rarity").as("max_rarity"))
      .orderBy($"lang")
  }

  // t14 linear-classifier geometry: hashing-trick bucket count and the
  // integer weight formula (Knuth multiplicative constant), mirrored
  // verbatim in the oracle
  private val ClsBuckets = 64

  /** LINEAR CLASSIFIER SCORING (t14): fastText-shaped quality-classifier
    * inference with the hashing trick — every distinct token hashes into
    * one of [[ClsBuckets]] weight buckets, the document score is the sum
    * of its buckets' weights, and the sign is the keep/drop label. This
    * is the shape of every learned quality gate (fastText, DSIR-style
    * importance classifiers) at inference time; the weights here are a
    * deterministic integer function of the bucket id (a trained model
    * would broadcast its weight vector — same plan) so the DuckDB oracle
    * reproduces scores exactly, with no float dot product to drift.
    *
    * Scale shape: scoring is a PURE PROJECTION (portable md5-prefix
    * hash, per-row lambda fold — no vocabulary relation, no join, no
    * shuffle by token); the only exchange is the final per-(lang,source)
    * report. A 100 TB corpus pays one scan. The weight table itself is
    * O(buckets) and lives in the instruction stream — the 100 TB analogue
    * broadcasts a few-MB float vector. */
  def t14ClassifierScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weight = (b: Column) => (b * lit(2654435761L)) % 997L - 498L
    val score = aggregate(
      array_distinct(split($"text", " ")),
      lit(0L),
      (a, x) => a + weight(h32(x) % ClsBuckets))
    t(s, dir, "documents")
      .withColumn("score", score)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"score" > 0, 1)).as("n_positive"),
        sum($"score").as("sum_score"),
        min($"score").as("min_score"),
        max($"score").as("max_score"))
      .orderBy($"lang", $"source")
  }

  // context-window chunking geometry (t12): window / stride in tokens
  private val ChunkTokens = 64
  private val ChunkStride = 48

  /** CONTEXT-WINDOW CHUNKING (t12): split every document into
    * overlapping token windows ([[ChunkTokens]] wide, [[ChunkStride]]
    * stride — 16-token overlap), the RAG-indexing / training-prep step
    * between cleaning and tokenization. Chunk count is integer math
    * (`(n - W + S - 1) div S + 1`), chunk rows come from one
    * `explode(sequence(...))` — a narrow generate, no shuffle until the
    * per-source report. At 100 TB chunks are emitted streaming per
    * input split; nothing is buffered per document. */
  def t12Chunking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .withColumn("n", size(split($"text", " ")).cast("long"))
      .withColumn("n_chunks", expr(
        s"CASE WHEN n <= $ChunkTokens THEN CAST(1 AS BIGINT) ELSE " +
          s"(n - $ChunkTokens + ${ChunkStride - 1}) DIV $ChunkStride + 1 END"))
    d.select($"doc_id", $"source", $"n", $"n_chunks",
        explode(sequence(lit(0L), $"n_chunks" - 1)).as("chunk_idx"))
      .withColumn("chunk_tokens",
        least(lit(ChunkTokens.toLong), $"n" - $"chunk_idx" * ChunkStride))
      .groupBy($"source")
      // every doc emits exactly one chunk 0 — counting it gives n_docs
      // in the SAME single-phase aggregate (countDistinct would add a
      // second exchange keyed by (source, doc_id))
      .agg(count(when($"chunk_idx" === 0L, 1)).as("n_docs"),
        count(lit(1)).as("n_chunks_total"),
        sum($"chunk_tokens").as("sum_chunk_tokens"),
        max($"n_chunks").as("max_chunks_per_doc"))
      .orderBy($"source")
  }

  /** Each language's target share of the training-token budget (equal
    * mixing here; a DoReMi-style pipeline would feed learned weights —
    * the PLAN is identical). Mirrored verbatim in the oracle. */
  private[ext] val TargetShare = 0.2

  /** DOMAIN MIXING weights (static reweighting): give every language an
    * equal share of the token budget by computing, per language, the
    * sampling weight `min(1, target_tokens / actual_tokens)` and the
    * resulting expected token count — the curation step that turns
    * cluster/language statistics into a sampling plan.
    *
    * One corpus scan → one (lang) aggregate; the corpus-wide total is a
    * single-row aggregate BROADCAST back onto the 5 language rows. At
    * 100 TB the heavy side is the one aggregate — weights themselves
    * are O(languages). */
  def t10DomainMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    langWeights(s, dir).orderBy($"lang")
  }

  /** The per-language mixing weights t10 reports — shared with d15's
    * weighted sampler so the applied weights can never drift from the
    * reported plan. */
  private[ext] def langWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perLang = t(s, dir, "documents")
      .withColumn("toks", size(split($"text", " ")).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("actual_tokens"))
    // the corpus-wide total rides a window over the POST-AGGREGATE rows
    // (one per language) — the corpus is scanned once, and the "global"
    // window only ever sees |languages| rows
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perLang
      .withColumn("total_tokens", sum($"actual_tokens").over(wAll))
      .withColumn("weight", round(least(lit(1.0),
        ($"total_tokens" * TargetShare) / $"actual_tokens"), 6))
      .withColumn("expected_tokens",
        round($"actual_tokens" * $"weight", 0).cast("long"))
      .select($"lang", $"n_docs", $"actual_tokens", $"weight",
        $"expected_tokens")
  }

  /** TF-IDF keyword extraction (t15): the top-5 most CHARACTERISTIC
    * terms per source — the classic per-domain vocabulary fingerprint
    * used to label corpus slices before mixing. score(source, word) =
    * total_tf(source, word) × ln(N / df(word)): the per-doc tf×idf sum
    * factors exactly (idf is constant per word), so the double arithmetic
    * is ONE multiply on an integer total — no float summation order to
    * disagree with the oracle (the t07 lesson). Two corpus-wide shapes:
    * tf by (source, word) and document frequency by word, both map-side
    * combinable hash aggregates over a single exploded scan; the final
    * top-k is a window over the tiny (source × vocab) aggregate, never
    * over documents. At 100 TB the aggregates shuffle O(vocab), not
    * O(corpus), and nothing collects to the driver. */
  def t15TfidfTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    // ONE corpus scan: the per-(doc, word) postings relation is cached
    // and feeds BOTH downstream aggregates — without it, Catalyst
    // re-executes the explode per branch, i.e. three corpus scans.
    val dw = RelCache.cached(s, s"$dir#tfidf_dw") {
      docs.select($"source", $"doc_id",
          explode(split($"text", " ")).as("word"))
        .groupBy("source", "doc_id", "word")
        .agg(count(lit(1)).as("tfd"))
    }
    val tf = dw.groupBy("source", "word").agg(sum($"tfd").as("tf"))
    val dfreq = dw.groupBy("word")
      .agg(count(lit(1)).as("df_docs"))
    val ndocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfreq, "word")
      .crossJoin(broadcast(ndocs))
      .withColumn("score", $"tf" * log($"n_docs" / $"df_docs"))
    val w = Window.partitionBy("source")
      .orderBy($"score".desc, $"word")
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"source", $"rn", $"word", $"tf", $"df_docs",
        round($"score", 6).as("tfidf"))
      .orderBy("source", "rn")
  }

  /** C4-style corpus-level LINE DEDUP with document reconstruction
    * (t16): every repeated text segment is removed from all but its
    * first occurrence (corpus order: lowest doc, then position), and
    * each document is REASSEMBLED from its surviving segments — the
    * C4 "three-sentence span" dedup stage, the one d-family rung that
    * edits documents instead of dropping them (d14 scrubs against a
    * FREQUENT set; this dedups against ALL segments). "Lines" are
    * fixed 8-word segments because the synthetic corpus has no
    * newlines; the operator is delimiter-agnostic.
    *
    * Scale shape: keep-first is a min-AGGREGATE on the segment key
    * (partial-combines map-side; never a global window), the winner
    * check is an equi-join back on that key, and reconstruction
    * shuffles by doc_id with per-doc bounded state (`collect_list`
    * over one document's segments — the t08 packing bound). At 100 TB
    * the segment key would be a 64-bit hash instead of the string;
    * grouping by the string keeps the oracle transparent and is
    * semantically identical. Output is the per-(lang, source) edit
    * report; the rebuilt text's length pins the reconstruction. */
  def t16LineDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val SegWords = 8
    val base = t(s, dir, "documents")
      .select($"doc_id", $"lang", $"source", split($"text", " ").as("words"))
    // encoded winner key: p < 2^20 makes (doc_id, p) lexicographic
    // order equal to doc_id*2^20+p numeric order in both engines
    // (alias-free for documents up to ~1M segments)
    val segs = RelCache.cached(s, s"$dir#t16_segs") {
      base.select($"doc_id", $"lang", $"source",
        posexplode(transform(
          // floor + cast: Spark's `/` on ints is DOUBLE division
          sequence(lit(0),
            floor((size($"words") - 1) / lit(SegWords)).cast("int")),
          i => concat_ws(" ",
            slice($"words", i * SegWords + 1, lit(SegWords)))))
          .as(Seq("p", "seg")))
        .withColumn("pk", $"doc_id" * 1048576L + $"p")
    }
    val winners = segs.groupBy($"seg").agg(min($"pk").as("wk"))
    val perDoc = segs.join(winners, "seg")
      .filter($"pk" === $"wk")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        length(array_join(
          transform(array_sort(collect_list(struct($"p", $"seg"))),
            x => x.getField("seg")), " ")).as("chars_kept"))
    segs.groupBy($"doc_id", $"lang", $"source")
      .agg(count(lit(1)).as("n_segs"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_segs").as("segs_total"),
        sum(coalesce($"n_kept", lit(0L))).as("segs_kept"),
        sum(coalesce($"chars_kept", lit(0L))).as("chars_kept"))
      .orderBy($"lang", $"source")
  }

  private val RelFilterPct = 10 // keep docs >= the per-source P10 length

  /** Relative (per-source percentile) quality filtering (t17): each
    * source keeps documents at or above its OWN 10th-percentile length
    * — the FineWeb/Gopher "relative filtering" stage, where thresholds
    * adapt to each source's distribution instead of one global cutoff
    * (a global floor over-prunes terse sources and under-prunes
    * verbose ones). The cutoff is the k-th smallest value with
    * k = (n-1) div 10 + 1 — an exact order statistic, identically
    * integer-defined in both engines (no percentile interpolation to
    * disagree about).
    *
    * Scale shape: the corpus is scanned ONCE into a per-(source,
    * length) HISTOGRAM (hash-aggregate, partial-combines map-side);
    * the order statistic is a cumulative-sum window over the histogram
    * — thousands of rows, not the corpus — and the kept/dropped report
    * is computed FROM the histogram too (counts and char totals are
    * linear in it), so no corpus row ever rides a window, a sort, or a
    * second scan. At 100 TB the histogram is |sources|x|distinct
    * lengths|, still driver-trivial but never collected. */
  def t17RelativeFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = RelCache.cached(s, s"$dir#t17_hist") {
      t(s, dir, "documents")
        .groupBy($"source", $"n_chars")
        .agg(count(lit(1)).as("c"))
    }
    val cum = hist
      .withColumn("cum", sum($"c").over(
        Window.partitionBy($"source").orderBy($"n_chars")))
    val tot = hist.groupBy($"source").agg(sum($"c").as("n"))
    val cutoff = cum.join(tot, "source")
      .filter($"cum" >= expr(s"(n - 1) div $RelFilterPct + 1"))
      .groupBy($"source").agg(min($"n_chars").as("cutoff_chars"))
    hist.join(broadcast(cutoff), "source")
      .groupBy($"source")
      .agg(
        sum($"c").as("n_docs"),
        min($"cutoff_chars").as("cutoff_chars"),
        sum(when($"n_chars" >= $"cutoff_chars", $"c").otherwise(0L))
          .as("n_kept"),
        sum(when($"n_chars" >= $"cutoff_chars", $"n_chars" * $"c")
          .otherwise(0L)).as("kept_chars"))
      .orderBy($"source")
  }

  private val VocabTopK = 20

  /** corpus unigram table (word, n_occ) — ONE tokenize+aggregate pass,
    * cached and shared by t18 (vocab ranking) and t19 (LM scoring). */
  private def vocabRel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    RelCache.cached(s, s"$dir#t18_vocab") {
      t(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word")
        .agg(count(lit(1)).as("n_occ"))
    }
  }

  /** Vocabulary induction (t18): corpus-wide word frequencies, the
    * top-[[VocabTopK]] vocabulary ranked by (count desc, word asc),
    * and each prefix's cumulative token coverage in basis points —
    * the "how big must the vocab be to cover X% of tokens" curve that
    * sizes a tokenizer before BPE training. Coverage is integral
    * (cum*10000 div total), so there is no float fold to disagree
    * about.
    *
    * Scale shape: ONE corpus pass — explode + hash-aggregate
    * partial-combines map-side, so the shuffle carries one row per
    * (mapper, distinct word), i.e. the vocabulary, not the corpus —
    * cached and shared by the total and the top-K branch. The top-K is
    * `TakeOrderedAndProject` (per-partition heads of K rows each —
    * never a global sort of the vocabulary), and both windows run over
    * the K selected rows only. */
  def t18Vocab(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = vocabRel(s, dir)
    val tot = vocab.agg(sum($"n_occ").as("total"))
    vocab.orderBy($"n_occ".desc, $"word").limit(VocabTopK)
      .crossJoin(broadcast(tot))
      .withColumn("rank",
        row_number().over(Window.orderBy($"n_occ".desc, $"word"))
          .cast("long"))
      .withColumn("cum", sum($"n_occ").over(Window.orderBy($"rank")))
      .select($"rank", $"word", $"n_occ",
        expr("(cum * 10000) div total").as("cum_coverage_bp"))
      .orderBy($"rank")
  }

  private val GrowthBuckets = 8 // corpus prefixes on the Heaps curve

  /** VOCABULARY GROWTH CURVE (t28): cumulative distinct-word count vs
    * cumulative token count at [[GrowthBuckets]] corpus prefixes in
    * doc_id order — the Heaps'-law diagnostic read before sizing a
    * tokenizer vocabulary (does vocab growth flatten, or is the crawl
    * still surfacing new domains?) and a cheap dedup anomaly signal (a
    * heavily duplicated corpus grows measurably sublinearly). Bucket
    * assignment is exact integer math over the id space —
    * `(id · B) div (max_id + 1) + 1` — mirrored verbatim in the
    * oracle, so there is no threshold rounding to disagree about.
    *
    * Scale shape: TWO corpus passes, both minimal for the semantics —
    * (1) first-occurrence per word: explode + min-aggregate, which
    * partial-combines map-side so the shuffle carries one row per
    * (mapper, distinct word), the vocabulary, not the token stream;
    * (2) per-doc token counts: a NARROW projection
    * (`size(filter(split))`, no explode) into a B-row aggregate. The
    * curve itself — join, coalesce, running sums — lives on ≤ 2·B
    * rows. Nothing ever shuffles by word except the vocabulary-sized
    * min-aggregate, and the max-id scalar rides a broadcast, not a
    * collect. */
  def t28VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val mx = docs.agg((max($"doc_id") + 1L).as("mm"))
    val wf = docs
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(min($"doc_id").as("first_doc"))
    val vb = wf.crossJoin(broadcast(mx))
      .withColumn("bucket",
        expr(s"(first_doc * $GrowthBuckets) div mm + 1"))
      .groupBy($"bucket").agg(count(lit(1)).as("v"))
    val db = docs.crossJoin(broadcast(mx))
      .withColumn("bucket", expr(s"(doc_id * $GrowthBuckets) div mm + 1"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("nd"),
        sum(size(filter(split($"text", " "), w => w =!= lit(""))))
          .as("nt"))
    val w = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    db.join(vb, Seq("bucket"), "left")
      .withColumn("v", coalesce($"v", lit(0L)))
      .select($"bucket", sum($"nd").over(w).as("n_docs"),
        sum($"nt").over(w).as("n_tokens"),
        sum($"v").over(w).as("vocab_size"))
      .orderBy($"bucket")
  }

  private val HeadCentibits = 800 // head/tail split: 8 bits/token

  /** Unigram LM quality scoring (t19): each document scored by its
    * average per-token SURPRISAL against a corpus unigram model — the
    * CCNet/perplexity-filter stage that splits a crawl into head
    * (LM-familiar) and tail (LM-surprising) before training. The float
    * trap is deliberate: -log2 p(w) = log2 N - log2 c computed in
    * DOUBLES can differ between engines in the last ulp and flip a
    * floor, so surprisal is INTEGER bits — `length(bin(N)) -
    * length(bin(c))` = floor(log2 N) - floor(log2 c) — and per-doc
    * sums/averages are integral (centibits, div), the d19 fixed-point
    * contract applied to LM scoring.
    *
    * Scale shape: the unigram table is the cached t18 vocabulary (one
    * tokenize pass shared across both entries within a session); the
    * dictionary BROADCASTS to the token stream — frequency dictionaries
    * are small (|vocab| ~ millions) and the corpus-side join must not
    * shuffle by word, whose frequency skew ("the" rides one reducer) is
    * exactly what broadcast avoids. Per-doc aggregation partial-combines
    * map-side; the report is per source. */
  def t19LmSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = vocabRel(s, dir)
    val nRow = vocab.agg(sum($"n_occ").as("n"))
    val toks = t(s, dir, "documents")
      .select($"doc_id", $"source", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
    val perDoc = toks
      .join(broadcast(vocab), "word")
      .crossJoin(broadcast(nRow))
      .select($"doc_id", $"source",
        (length(bin($"n")) - length(bin($"n_occ"))).cast("long").as("bits"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_tok"), sum($"bits").as("bits_sum"))
      .withColumn("avg_centibits", expr("(bits_sum * 100) div n_tok"))
    perDoc.groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        expr("sum(avg_centibits) div count(1)").as("mean_centibits"),
        count(when($"avg_centibits" <= HeadCentibits, 1)).as("n_head"),
        count(when($"avg_centibits" > HeadCentibits, 1)).as("n_tail"))
      .orderBy($"source")
  }

  /** ordered BPE merge table — rule i merges adjacent tokens (a, b)
    * into ab; later rules build on earlier outputs ("jo"+"in"→"join"
    * requires rules 7 and 3 first). A constant literal because this is
    * the APPLY operator: in production the merges file is trained once
    * offline (t18's induction is the counting half) and shipped to
    * every executor as a broadcast/literal — it never joins the corpus. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "o" -> "w", "i" -> "n", "s" -> "t", "a" -> "t",
    "t" -> "h", "j" -> "o", "jo" -> "in", "h" -> "a", "ha" -> "s")

  /** BPE TOKENIZER APPLICATION (t20): tokenize every word with a real
    * byte-pair-encoding merge table — the step that turns a curated
    * corpus into the token stream training actually consumes (t03's
    * counts are whitespace proxies; THIS is the tokenizer). Each word
    * is exploded to marked characters (`_c` per char, space-joined,
    * trailing space), then the merge rules apply in priority order as
    * left-to-right non-overlapping string replaces: the `_` start
    * marker and the trailing-space end marker make the pattern
    * `"_a _b "` match exactly a token PAIR boundary — never a token's
    * interior ("_th _a" cannot lose its `h` to rule (h,a), and
    * "_a _bc" cannot satisfy rule (a,b)) — so the fold IS greedy BPE
    * application, unrolled. Output is integral (token counts, basis
    * points via div): zero cross-engine float surface.
    *
    * Scale shape: a PURE PROJECTION per document (the merges are
    * literals inside one codegen'd expression tree — the corpus never
    * shuffles by token) followed by one per-(lang, source) report
    * aggregate with map-side combines. At 100 TB this is the 1000-rule
    * GPT-2-style table in the same unrolled form, or a native
    * Expression looping the table — the plan shape is identical. */
  def t20BpeApply(s: SparkSession, dir: String): DataFrame =
    bpeReport(s, dir, BpeMerges)

  /** the shared tokenize-and-report projection: apply an ordered merge
    * table (driver literals inside one codegen'd expression tree) to
    * every word and aggregate the per-(lang, source) compression
    * report. Shared by t20 (shipped constant table) and t24 (the table
    * t23 just learned). `merges` tokens are UNMARKED (as t23 emits
    * them); the marker is added here. */
  private def bpeReport(s: SparkSession, dir: String,
                        merges: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    def bpe(w: Column): Column = merges.foldLeft(
      regexp_replace(w, lit("(.)"), lit("_$1 "))) { case (c, (a, b)) =>
      replace(c, lit(s"_$a _$b "), lit(s"_$a$b "))
    }
    t(s, dir, "documents")
      .withColumn("wordsarr", filter(split($"text", " "), x => x =!= ""))
      .select($"lang", $"source",
        size($"wordsarr").cast("long").as("n_words"),
        length(replace($"text", lit(" "), lit(""))).cast("long").as("n_chars"),
        aggregate(transform($"wordsarr",
            w => size(split(trim(bpe(w)), " ")).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_bpe"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_words").as("words_total"),
        sum($"n_chars").as("chars_total"),
        sum($"n_bpe").as("bpe_tokens"))
      .withColumn("tokens_per_char_bp",
        expr("bpe_tokens * 10000 div chars_total"))
      .orderBy($"lang", $"source")
  }

  // Gopher repetition thresholds in basis points of document chars
  private val RepTop2Bp = 2000 // top 2-gram covers > 20% of chars
  private val RepTop3Bp = 1800 // top 3-gram covers > 18%
  private val RepDup2Bp = 4000 // repeated 2-grams cover > 40%

  /** N-GRAM REPETITION FILTERS (t21): the second half of the Gopher
    * quality suite — t06 covers the length/stopword/lexical-diversity
    * rules; THIS covers the repetition rules (Rae et al. 2021 §A1.1):
    * the character fraction covered by the single most frequent 2-gram
    * and 3-gram, and by ALL 2-grams occurring more than once, each
    * per document in integer basis points (the d19 fixed-point
    * contract — no float fraction crosses engines). A document fails
    * on any signal over its threshold; the report counts failures per
    * signal and clean passes per (lang, source).
    *
    * Scale shape: ONE corpus scan explodes both gram lengths (tagged
    * structs, one Generate); counts and per-doc argmax are hash
    * aggregates with map-side combines (the argmax is a min-struct on
    * (-count, gram) — never a per-doc window over the gram stream);
    * the three per-doc signals join back on doc_id. Nothing wider
    * than (doc_id, gram) ever shuffles. */
  def t21RepetitionFilters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents")
      .select($"doc_id", $"lang", $"source", split($"text", " ").as("w"),
        length(replace($"text", lit(" "), lit(""))).cast("long").as("chars"))
    // sequence(1, size-n+1) is DESCENDING when size < n — guard short docs
    def gramArr(n: Int): Column = when(size($"w") >= n,
      expr(s"transform(sequence(1, size(w) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(w, i, $n)))"))
      .otherwise(expr("cast(array() as array<string>)"))
    val grams = base.select($"doc_id",
      explode(concat(
        transform(gramArr(2), g => struct(lit(2).as("n"), g.as("g"))),
        transform(gramArr(3), g => struct(lit(3).as("n"), g.as("g")))))
        .as("x"))
      .select($"doc_id", $"x.n".as("n"), $"x.g".as("g"))
    val cnt = grams.groupBy($"doc_id", $"n", $"g")
      .agg(count(lit(1)).as("c"))
      .withColumn("gchars", (length($"g") - ($"n" - 1)).cast("long"))
    val top = cnt.groupBy($"doc_id", $"n")
      .agg(min(struct((-$"c").as("nc"), $"g".as("g"),
        ($"c" * $"gchars").as("tc"))).as("m"))
      .select($"doc_id", $"n", $"m.tc".as("topchars"))
    val dup2 = cnt.filter($"n" === 2 && $"c" > 1)
      .groupBy($"doc_id").agg(sum($"c" * $"gchars").as("dupchars"))
    val perDoc = base.select($"doc_id", $"lang", $"source", $"chars")
      .join(top.filter($"n" === 2)
        .select($"doc_id", $"topchars".as("t2")), Seq("doc_id"), "left")
      .join(top.filter($"n" === 3)
        .select($"doc_id", $"topchars".as("t3")), Seq("doc_id"), "left")
      .join(dup2, Seq("doc_id"), "left")
      .withColumn("top2_bp", expr("coalesce(t2, 0) * 10000 div chars"))
      .withColumn("top3_bp", expr("coalesce(t3, 0) * 10000 div chars"))
      .withColumn("dup2_bp", expr("coalesce(dupchars, 0) * 10000 div chars"))
    perDoc.groupBy($"lang", $"source").agg(
      count(lit(1)).as("n_docs"),
      expr("sum(top2_bp) div count(1)").as("mean_top2_bp"),
      count(when($"top2_bp" > RepTop2Bp, 1)).as("n_fail_top2"),
      count(when($"top3_bp" > RepTop3Bp, 1)).as("n_fail_top3"),
      count(when($"dup2_bp" > RepDup2Bp, 1)).as("n_fail_dup2"),
      count(when($"top2_bp" <= RepTop2Bp && $"top3_bp" <= RepTop3Bp &&
        $"dup2_bp" <= RepDup2Bp, 1)).as("n_pass"))
      .orderBy($"lang", $"source")
  }

  /** Vocabulary coverage / OOV evaluation (t22): the top-[[VocabTopK]]
    * induced vocabulary (t18's exact relation, shared via the session
    * cache) scored against the corpus it was induced from — per
    * (lang, source): token count, out-of-vocabulary occurrences, OOV
    * rate in basis points, and distinct OOV types. This is the number
    * that decides whether a tokenizer's vocab is big enough for a new
    * data source before a training run wastes compute on `<unk>`
    * floods — the t18→t22 pair mirrors s02→s10 (build, then measure
    * the build), the evaluation-family pattern.
    *
    * Scale shape: the vocabulary BROADCASTS to the token stream (the
    * corpus never shuffles by word — word frequency skew would hot-spot
    * any word-keyed exchange); membership is a broadcast LEFT join with
    * a null probe. The per-(lang, source) aggregate partial-combines
    * map-side; the distinct-OOV-type count shuffles one row per
    * (lang, source, distinct OOV word) — vocabulary-scale, not
    * corpus-scale. Fixed-point contract: oov_bp is integral
    * (`n_oov * 10000 div n_tokens`), nothing floats. */
  def t22OovEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topVocab = vocabRel(s, dir)
      .orderBy($"n_occ".desc, $"word").limit(VocabTopK)
      .select($"word", lit(1L).as("in_vocab"))
    val toks = t(s, dir, "documents")
      .select($"lang", $"source", explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
    toks.join(broadcast(topVocab), Seq("word"), "left")
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when($"in_vocab".isNull, 1)).as("n_oov"),
        countDistinct(when($"in_vocab".isNull, $"word")).as("n_oov_types"))
      .withColumn("oov_bp", expr("n_oov * 10000 div n_tokens"))
      .orderBy($"lang", $"source")
  }

  private val BpeTrainRounds = 8

  /** marked-char encoded vocabulary: one row per distinct word with its
    * corpus count and t20's `_c _c … ` token encoding — BPE training's
    * working set. Built from the cached [[vocabRel]], so the corpus is
    * scanned once per session across t18/t19/t22/t23. */
  private[graft] def t23EncodedVocab(s: SparkSession, dir: String): DataFrame =
    vocabRel(s, dir).select(col("n_occ"),
      regexp_replace(col("word"), lit("(.)"), lit("_$1 ")).as("enc"))

  /** adjacent-pair counts over an encoded vocab: explode each word's
    * token sequence to (a, b) pairs, weight by the word's corpus count,
    * hash-aggregate. The whole round is ONE aggregate over the
    * VOCABULARY relation — never the corpus. */
  private[graft] def t23PairCounts(enc: DataFrame): DataFrame = {
    val toks = split(trim(col("enc")), " ")
    enc.filter(size(toks) >= 2)
      .select(col("n_occ"), explode(transform(
        sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("a"),
          element_at(toks, i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n_occ")).as("c"))
  }

  /** BPE MERGE-TABLE INDUCTION (t23): learn the merge rules t20 applies
    * — the build half of the tokenizer pair (t18→t22 is build→measure
    * for the vocab; t23→t20 is train→apply for BPE). Classic Sennrich
    * et al. 2016 training: for [[BpeTrainRounds]] rounds, count adjacent
    * token pairs over the word-frequency table (weighted by word count),
    * take the most frequent pair (ties: count desc, then pair asc — a
    * total order), record it as the next rule, and merge it everywhere
    * via t20's marked-char string replace. Output is the ordered merge
    * table (step, token_a, token_b, n_pair) — all integral.
    *
    * Scale shape: training runs over the VOCABULARY (the cached t18
    * word-count relation — one corpus scan per session), never the
    * corpus: each round is one explode+hash-aggregate over |vocab| rows
    * with map-side combines, a top-1 TakeOrdered (never a global sort),
    * and a 1-row collect — the d13 driver-literal pattern (the merge
    * list is O(rounds) metadata, exactly what a production BPE trainer
    * ships between iterations). The chosen rule re-encodes the vocab as
    * a pure projection. At 100 TB only the one-off vocab build touches
    * the corpus; rounds cost O(|vocab|) each, independent of corpus
    * size. The pair aggregate is aggregate-only (no corpus window) —
    * pinned in PlanShapeSpec. */
  def t23BpeTrain(s: SparkSession, dir: String): DataFrame =
    t23Merges(s, dir).orderBy("step")

  /** The learned merge table — a pure function of the corpus, so the
    * TRAINING LOOP (rounds × pair-count jobs) runs once per session and
    * every later t23/t24 call reads the O(rounds) cached result (the
    * d26_sig convention). */
  private def t23Merges(s: SparkSession, dir: String): DataFrame =
    RelCache.cached(s, s"$dir#t23_merges") {
      import s.implicits._
      var enc = t23EncodedVocab(s, dir)
      val rules = Seq.newBuilder[(Long, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= BpeTrainRounds && !exhausted) {
        t23PairCounts(enc).orderBy($"c".desc, $"a", $"b").limit(1)
          .collect().headOption match {
          case Some(r) =>
            val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
            rules += ((step.toLong, a.stripPrefix("_"), b.stripPrefix("_"), c))
            enc = enc.withColumn("enc",
              replace($"enc", lit(s"$a $b "), lit(s"$a${b.stripPrefix("_")} ")))
            step += 1
          case None => exhausted = true
        }
      }
      rules.result().toDF("step", "token_a", "token_b", "n_pair")
    }

  /** LEARNED-BPE APPLICATION (t24): tokenize the corpus with the merge
    * table [[t23BpeTrain]] just induced — the full train→apply loop
    * closed on REAL learned rules (t20 applies a shipped constant
    * table; here the table is the trainer's own output, so the
    * compression report measures the trained tokenizer, the
    * curation-loop pattern of d15/t10). The merge list arrives as
    * driver literals — O(rounds) metadata, exactly how a trained merges
    * file ships to executors — so the application stays t20's pure
    * projection (pinned: one corpus scan, no join, no explode, no
    * window). Contract: the corpus must support [[BpeTrainRounds]]
    * rounds (a corpus so degenerate that pair counting runs dry would
    * apply fewer rules). */
  def t24LearnedBpeApply(s: SparkSession, dir: String): DataFrame = {
    val merges = t23Merges(s, dir).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // loud, not divergent: a corpus that exhausts pair counting early
    // would silently apply fewer rules here while the unrolled oracle
    // degenerates to NULL aggregates — fail the declared precondition
    // instead
    require(merges.size == BpeTrainRounds,
      s"BPE training exhausted after ${merges.size} of $BpeTrainRounds rounds")
    bpeReport(s, dir, merges)
  }


  private val BigramHeadCentibits = 458 // head/tail split, integer centibits
  private val BigramVocab = 4096        // top-K bigram head kept as the model
  private val BigramBackoffBits = 20L   // surprisal charged to unseen bigrams

  /** Session-cached adjacent-word-pair relation `(doc_id, source, w1,
    * w2)` — ONE tokenize pass feeds t25's LM model+scoring and t26's
    * DSIR features (the t15-postings convention). */
  private def bigramRel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    RelCache.cached(s, s"$dir#t25_bigrams") {
      t(s, dir, "documents")
        .select($"doc_id", $"source",
          filter(split($"text", " "), w => w =!= "").as("w"))
        .filter(size($"w") >= 2)
        .select($"doc_id", $"source", explode(transform(
          sequence(lit(1), size($"w") - 1),
          i => struct(element_at($"w", i).as("w1"),
            element_at($"w", i + 1).as("w2")))).as("p"))
        .select($"doc_id", $"source", $"p.w1", $"p.w2")
    }
  }

  /** BIGRAM LM SURPRISAL (t25): per-document average conditional
    * surprisal -log2 p(w2|w1) against a TRUNCATED corpus bigram model —
    * the next LM-scoring rung after t19's unigram model (a unigram
    * model scores WORD rarity; the bigram model scores SEQUENCE
    * predictability, the signal that separates fluent text from
    * shuffled-word salad at equal vocabulary). The model is the
    * standard head-truncated LM: only the top-`BigramVocab` bigrams by
    * count (ties broken on (w1, w2)) keep explicit probabilities; any
    * bigram outside the head is charged a flat `BigramBackoffBits`
    * backoff surprisal. The t19 fixed-point contract: in-head
    * conditional bits = floor(log2 c(w1·)) - floor(log2 c(w1 w2)) via
    * `length(bin(c))` (c(w1·) counts w1 as a bigram LEFT, so bits >= 0
    * always), per-doc means in integer centibits — no float crosses
    * engines.
    *
    * Scale shape: the adjacent-pair relation is cached and feeds the
    * model build AND the scoring join (one tokenize pass); both model
    * tables BROADCAST to the pair stream — a corpus-side shuffle keyed
    * by bigram would hot-spot on "of the"-class keys, exactly the skew
    * broadcast sidesteps. Both broadcast sides are K-BOUNDED BY
    * CONSTRUCTION: the bigram head is a top-K limit and the unigram
    * table is semi-joined to the head's left words (<= K rows), so the
    * broadcast stays driver-safe no matter how many distinct bigrams a
    * 100 TB corpus holds. */
  def t25BigramSurprisal(s: SparkSession, dir: String): DataFrame = {
    bigramSurprisalCore(bigramRel(s, dir), BigramVocab, BigramBackoffBits,
      BigramHeadCentibits,
      cacheHead = h => RelCache.cached(s, s"$dir#t25_head")(h))
  }

  /** Scoring core of [[t25BigramSurprisal]] over an adjacent-pair
    * relation `(doc_id, source, w1, w2)`, with the model size and
    * backoff INJECTABLE: the gate corpus has fewer distinct bigrams
    * than the production `BigramVocab`, so only a test driving a small
    * K can reach the truncation boundary (tie-break at rank K, the
    * backoff branch, the head-restricted unigram join) —
    * PipelineOpsSpec's "t25 core at a small K" test does exactly
    * that. */
  private[graft] def bigramSurprisalCore(bi: DataFrame, headK: Int,
      backoffBits: Long, headCentibits: Int,
      cacheHead: DataFrame => DataFrame = identity): DataFrame = {
    val s = bi.sparkSession
    import s.implicits._
    val big = cacheHead(
      bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
        .orderBy(desc("c2"), $"w1", $"w2").limit(headK))
    val uni = bi.groupBy($"w1").agg(count(lit(1)).as("c1"))
      .join(broadcast(big.select($"w1").distinct()), Seq("w1"))
    val perDoc = bi
      .join(broadcast(big), Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .select($"doc_id", $"source",
        when($"c2".isNotNull,
          (length(bin($"c1")) - length(bin($"c2"))).cast("long"))
          .otherwise(lit(backoffBits)).as("bits"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_bi"), sum($"bits").as("bits_sum"))
      .withColumn("avg_centibits", expr("(bits_sum * 100) div n_bi"))
    perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(avg_centibits) div count(1)").as("mean_centibits"),
        count(when($"avg_centibits" <= headCentibits, 1)).as("n_head"),
        count(when($"avg_centibits" > headCentibits, 1)).as("n_tail"))
      .orderBy($"source")
  }

  private val DsirBuckets = 256          // hashed bigram feature space
  private val DsirTargetSource = "src0"  // curated-target stand-in
  private val DsirSelectCentibits = 0L   // >= 0: more target- than raw-like

  /** DSIR IMPORTANCE SCORING (t26): Data Selection via Importance
    * Resampling (Xie et al., NeurIPS 2023) — every raw document scored
    * by how much more likely its hashed n-gram features are under a
    * small CURATED target distribution than under the raw-crawl
    * distribution, the selection stage that front-loads "looks like
    * the data I want" before any model-based quality gate. Features
    * are word bigrams hashed into [[DsirBuckets]] buckets (the paper's
    * hashed n-gram estimator — collisions are part of the estimator,
    * not noise); the target is the [[DsirTargetSource]] slice standing
    * in for the curated corpus. Per-token importance is the log-ratio
    * log2 p_target(b) - log2 p_raw(b) in the t19 floor-log2 integer
    * contract: bits(c+1) via `length(bin(..))` with +1 Laplace
    * smoothing, the two normalizing totals entering as per-token
    * constants. Scores are SIGNED, so per-doc averaging uses explicit
    * floor division on the double quotient — exact here because
    * |sum| <= 128·n_bigrams stays far below 2^53 and a non-integer
    * quotient sits >= 1/n_bi away from any integer (documented bound;
    * `div`'s truncation would disagree with floor on negatives).
    *
    * Scale shape: features project the SESSION-CACHED [[bigramRel]]
    * (one tokenize pass shared with t25); both count tables and the
    * weight table are <= [[DsirBuckets]] rows and BROADCAST onto the
    * feature stream — the corpus never shuffles by bucket (skewed:
    * stop-word bigrams concentrate); per-doc aggregation
    * partial-combines map-side; the report is per source. */
  def t26DsirScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = bigramRel(s, dir).select($"doc_id", $"source",
      (h32(concat_ws(" ", $"w1", $"w2")) % DsirBuckets).as("b"))
    // both distributions + their totals from ONE aggregate over the
    // cached feature stream (conditional count = the target slice);
    // the totals derive from the <=256-row result, not a corpus pass.
    // Session-cached: the model is fixed per corpus — repeated calls
    // pay only the scoring join.
    val weights = RelCache.cached(s, s"$dir#t26_weights") {
      val perB = feats.groupBy($"b").agg(
        count(lit(1)).as("c_r"),
        count(when($"source" === DsirTargetSource, 1)).as("c_t"))
      val tot = perB.agg(sum($"c_r").as("n_r"), sum($"c_t").as("n_t"))
      perB.crossJoin(tot)
        .select($"b",
          ((length(bin($"c_t" + 1)) - length(bin($"c_r" + 1))) +
           (length(bin($"n_r" + 1)) -
            length(bin($"n_t" + 1)))).cast("long").as("bits"))
    }
    val perDoc = feats.join(broadcast(weights), Seq("b"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_bi"), sum($"bits").as("bits_sum"))
      .withColumn("avg_centibits",
        floor(($"bits_sum" * 100) / $"n_bi").cast("long"))
    perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        floor(sum($"avg_centibits") / count(lit(1))).cast("long")
          .as("mean_centibits"),
        count(when($"avg_centibits" >= DsirSelectCentibits, 1))
          .as("n_selected"))
      .orderBy($"source")
  }

  private val NbBuckets = 512 // hashed unigram feature space
  private val NbTestMod = 5   // doc_id % 5 == 0 → held-out test fifth

  /** NAIVE BAYES CLASSIFIER — TRAIN + SCORE IN-ENGINE (t27): the
    * quality/language-classifier TRAINING step the crawl pipelines run
    * before t14-style inference (CCNet trains fastText on curated-vs-
    * crawl; fastText itself is a linear model over hashed features) —
    * here the full loop: multinomial NB over hashed unigrams trained on
    * the doc_id-split train fifth's lang labels, scored on the held-out
    * fifth, accuracy per class. Training a linear model IS two hash
    * aggregates (per-(class, bucket) counts + per-class totals), which
    * is why it belongs in the engine rather than a driver-side loop.
    * The t19/t26 floor-log2 integer contract: per-token weight =
    * bits(cnt+1) − bits(tot + B) (+1 Laplace over [[NbBuckets]]
    * buckets), class prior = bits(n_docs_c); scores are exact BIGINT
    * sums, argmax is a (score DESC, class ASC) total order.
    *
    * Scale shape: ONE tokenize pass builds the cached per-(doc, bucket)
    * count relation that feeds BOTH training aggregates and scoring;
    * the model is a ≤ classes·[[NbBuckets]]-row grid (unseen buckets
    * densified to the smoothing weight) that BROADCASTS onto the test
    * feature stream — the corpus never shuffles by token or bucket
    * (stop-word skew); per-(doc, class) sums partial-combine; the
    * argmax window runs over test-docs × classes rows only.
    *
    * Honesty note on the gate numbers: the synthetic corpus's 31-word
    * vocabulary is frequency-UNIFORM across languages (every word in
    * every lang at ~33‰), so there is no lexical lang signal to learn
    * and majority-class is Bayes-optimal here — the entry pins the
    * machinery and the exact integer math; PipelineOpsSpec drives
    * [[nbClassifierCore]] on a constructed separable corpus (the d13
    * convention) to prove the model actually learns when signal
    * exists. Floor-log2 weights resolve frequency ratios ≥ 2×. */
  def t27NbClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feat = RelCache.cached(s, s"$dir#t27_feats") {
      nbFeatures(t(s, dir, "documents").select($"doc_id", $"lang", $"text"))
    }
    nbClassifierCore(feat, NbBuckets, NbTestMod,
      cacheModel = m => RelCache.cached(s, s"$dir#t27_model")(m))
  }

  /** Hashed-unigram count features `(doc_id, lang, b, n)` for
    * [[nbClassifierCore]] — one explode + one aggregate. */
  private[graft] def nbFeatures(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", $"lang",
        explode(filter(split($"text", " "), w => w =!= "")).as("word"))
      .select($"doc_id", $"lang", (h32($"word") % NbBuckets).as("b"))
      .groupBy($"doc_id", $"lang", $"b").agg(count(lit(1)).as("n"))
  }

  /** Train + score over a feature relation `(doc_id, lang, b, n)` —
    * injectable so PipelineOpsSpec can drive a constructed separable
    * corpus through the exact production plan. */
  private[graft] def nbClassifierCore(feat: DataFrame, buckets: Int,
      testMod: Int, cacheModel: DataFrame => DataFrame = identity): DataFrame = {
    val s = feat.sparkSession
    import s.implicits._
    val train = feat.filter($"doc_id" % testMod =!= 0)
    val model = cacheModel {
      val cb = train.groupBy($"lang".as("c"), $"b").agg(sum($"n").as("cnt"))
      val ct = cb.groupBy($"c").agg(sum($"cnt").as("tot"))
      // densify to the full classes × buckets grid so unseen buckets
      // carry the smoothing weight (grid is model-sized, never corpus)
      val grid = ct.crossJoin(s.range(buckets).select($"id".as("b")))
      val pri = train.select($"doc_id", $"lang".as("c")).distinct()
        .groupBy($"c").agg(count(lit(1)).as("n_docs"))
      grid.join(cb, Seq("c", "b"), "left")
        .join(pri, Seq("c"))
        .select($"c", $"b",
          (length(bin(coalesce($"cnt", lit(0L)) + 1)) -
            length(bin($"tot" + buckets))).cast("long").as("wbits"),
          length(bin($"n_docs")).cast("long").as("pbits"))
    }
    val test = feat.filter($"doc_id" % testMod === 0)
    val scored = test.join(broadcast(model), Seq("b"))
      .groupBy($"doc_id", $"lang", $"c", $"pbits")
      .agg(sum($"n" * $"wbits").as("tokbits"))
      .select($"doc_id", $"lang", $"c",
        ($"tokbits" + $"pbits").as("score"))
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"c")
    val pred = scored.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"c".as("pred"))
    pred.groupBy($"lang")
      .agg(count(lit(1)).as("n_test"),
        count(when($"pred" === $"lang", 1)).as("n_correct"),
        expr("count(CASE WHEN pred = lang THEN 1 END) * 10000 div count(1)")
          .as("accuracy_bp"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t27_nb_classifier" -> (t27NbClassifier _),
    "t26_dsir_score" -> (t26DsirScore _),
    "t25_bigram_surprisal" -> (t25BigramSurprisal _),
    "t24_learned_bpe_apply" -> (t24LearnedBpeApply _),
    "t23_bpe_train" -> (t23BpeTrain _),
    "t22_oov_eval" -> (t22OovEval _),
    "t21_repetition_filters" -> (t21RepetitionFilters _),
    "t20_bpe_apply" -> (t20BpeApply _),
    "t19_lm_surprisal" -> (t19LmSurprisal _),
    "t18_vocab" -> (t18Vocab _),
    "t28_vocab_growth" -> (t28VocabGrowth _),
    "t17_relative_filter" -> (t17RelativeFilter _),
    "t16_line_dedup" -> (t16LineDedup _),
    "t15_tfidf_terms" -> (t15TfidfTerms _),
    "t14_classifier_score" -> (t14ClassifierScore _),
    "t13_rarity_filter" -> (t13RarityFilter _),
    "t12_chunking" -> (t12Chunking _),
    "t11_pii_redact" -> (t11PiiRedact _),
    "t10_domain_mix" -> (t10DomainMix _),
    "t09_blocklist_scrub" -> (t09BlocklistScrub _),
    "t06_gopher_filters" -> (t06GopherFilters _),
    "t08_sequence_packing" -> (t08SequencePacking _),
    "t01_langid" -> (t01LangId _),
    "t02_quality_score" -> (t02QualityScore _),
    "t03_token_count" -> (t03TokenCount _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_prep_pipeline" -> (t05PrepPipeline _),
    "t07_bm25" -> (t07Bm25 _),
  )

  /** DuckDB twin of [[t07Bm25]] — private[ext]: s14's hybrid-retrieval
    * oracle composes this ranking with s01's dense ranking (the s10
    * composition pattern). Constants interpolated from the SAME Scala
    * values the Spark plan uses (shortest round-trip repr) — both
    * engines see identical doubles, so the per-row arithmetic agrees
    * bit-for-bit. */
  private[ext] lazy val t07OracleSql: String = {
    val tfs = bm25Terms.zipWithIndex.map { case (tm, i) =>
      s"len(list_filter(string_split(text, ' '), x -> x = '$tm'))::DOUBLE AS tf_$i"
    }.mkString(",\n        ")
    val dfs = bm25Terms.indices.map(i =>
      s"count(CASE WHEN tf_$i > 0 THEN 1 END)::DOUBLE AS df_$i")
      .mkString(", ")
    val terms = bm25Terms.indices.map { i =>
      s"ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1) * " +
        s"(tf_$i * ${bm25K1 + 1}) / (tf_$i + $bm25K1 * " +
        s"(${1 - bm25B} + $bm25B * dl / avgdl))"
    }.mkString("\n          + ")
    s"""WITH d AS (
      |  SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl,
      |    $tfs
      |  FROM documents),
      |s AS (
      |  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, $dfs FROM d)
      |SELECT doc_id, round($terms, 6) AS bm25
      |FROM d, s ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
  }

  private val markerSql: Map[String, String] = markers.map { case (l, ws) =>
    l -> ws.map(w => s"x = '$w'").mkString(" OR ")
  }.toMap

  private val blockedSql = blocklist.map(b => s"x = '$b'").mkString(" OR ")

  /** DuckDB twin of [[t20BpeApply]]'s per-word merge chain: identical
    * unrolled replaces over the identical marked-char encoding (RE2
    * spells group 1 as `\1` where Java spells `$1` — same semantics). */
  private val bpeChainSql: String = BpeMerges.foldLeft(
    """regexp_replace(w, '(.)', '_\1 ', 'g')""") { case (c, (a, b)) =>
    s"replace($c, '_$a _$b ', '_$a$b ')"
  }

  /** DuckDB twin of [[t23BpeTrain]]: the iterative trainer unrolled as
    * one CTE chain per round — pair counts over v{r-1}, top-1 by the
    * identical (count desc, pair asc) total order, re-encode via the
    * identical replace. DuckDB range() is end-exclusive and lists are
    * 1-based, so `i in range(1, len(t))` pairs t[i] with t[i+1]. */
  private lazy val t23CteBlock: String = {
    val v0 =
      """v0 AS MATERIALIZED (
        |  SELECT count(*)::BIGINT AS n_occ,
        |    regexp_replace(word, '(.)', '_\1 ', 'g') AS enc
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin
    val rounds = (1 to BpeTrainRounds).map { r =>
      s"""p$r AS MATERIALIZED (
        |  SELECT t[i] AS a, t[i+1] AS b, sum(n_occ) AS c
        |  FROM (SELECT n_occ, t, unnest(range(1, len(t))) AS i
        |        FROM (SELECT n_occ, string_split(trim(enc), ' ') AS t
        |              FROM v${r - 1}))
        |  GROUP BY t[i], t[i+1]),
        |m$r AS MATERIALIZED (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
        |v$r AS MATERIALIZED (
        |  SELECT n_occ,
        |    replace(enc, m.a || ' ' || m.b || ' ',
        |            m.a || substring(m.b, 2) || ' ') AS enc
        |  FROM v${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"$v0,\n$rounds"
  }

  private lazy val t23OracleSql: String = {
    val steps = (1 to BpeTrainRounds).map { r =>
      s"""SELECT $r::BIGINT AS step, substring(a, 2) AS token_a,
        |  substring(b, 2) AS token_b, c::BIGINT AS n_pair FROM m$r""".stripMargin
    }.mkString("\nUNION ALL ")
    s"WITH $t23CteBlock\n$steps\nORDER BY step"
  }

  /** DuckDB twin of [[t24LearnedBpeApply]]: the t23 trainer CTE chain,
    * the 8 learned rules pivoted to one row of scalar subqueries, and
    * t20's application/report shape folding replaces over those
    * columns (lambdas may reference row columns; subqueries may not
    * appear inside a lambda body, hence the pivot). */
  private lazy val t24OracleSql: String = {
    val mm = (1 to BpeTrainRounds).map(r =>
      s"(SELECT a FROM m$r) AS a$r, (SELECT b FROM m$r) AS b$r")
      .mkString(", ")
    val chain = (1 to BpeTrainRounds).foldLeft(
      """regexp_replace(w, '(.)', '_\1 ', 'g')""") { (c, r) =>
      s"replace($c, a$r || ' ' || b$r || ' ', a$r || substring(b$r, 2) || ' ')"
    }
    s"""WITH $t23CteBlock,
      |mm AS MATERIALIZED (SELECT $mm),
      |perdoc AS (
      |  SELECT lang, source,
      |    len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS n_words,
      |    length(replace(text, ' ', '')) AS n_chars,
      |    list_sum(list_transform(
      |      list_filter(string_split(text, ' '), x -> x <> ''),
      |      w -> len(string_split(trim($chain), ' ')))) AS n_bpe
      |  FROM documents, mm)
      |SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_words) AS BIGINT) AS words_total,
      |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
      |  CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
      |  CAST(sum(n_bpe) * 10000 // sum(n_chars) AS BIGINT)
      |    AS tokens_per_char_bp
      |FROM perdoc GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // feat MATERIALIZED: the tokenize pass feeds train counts, priors,
    // and the test scoring join; model MATERIALIZED: read by scoring
    "t27_nb_classifier" ->
      s"""WITH feat AS MATERIALIZED (
        |  SELECT doc_id, lang, b, count(*)::BIGINT AS n FROM (
        |    SELECT doc_id, lang,
        |      ('0x' || substring(md5(word), 1, 8))::BIGINT % $NbBuckets AS b
        |    FROM (SELECT doc_id, lang,
        |            unnest(string_split(text, ' ')) AS word
        |          FROM documents)
        |    WHERE word <> '')
        |  GROUP BY doc_id, lang, b),
        |train AS (SELECT * FROM feat WHERE doc_id % $NbTestMod <> 0),
        |cb AS MATERIALIZED (
        |  SELECT lang AS c, b, sum(n)::BIGINT AS cnt
        |  FROM train GROUP BY 1, 2),
        |ct AS (SELECT c, sum(cnt)::BIGINT AS tot FROM cb GROUP BY c),
        |pri AS (SELECT lang AS c, count(*)::BIGINT AS n_docs FROM
        |        (SELECT DISTINCT doc_id, lang FROM train) GROUP BY 1),
        |grid AS (SELECT c, tot, gb.b FROM ct,
        |         (SELECT unnest(range(0, $NbBuckets)) AS b) gb),
        |model AS MATERIALIZED (
        |  SELECT g.c, g.b,
        |    (length(bin(coalesce(cnt, 0) + 1))
        |      - length(bin(g.tot + $NbBuckets)))::BIGINT AS wbits,
        |    length(bin(n_docs))::BIGINT AS pbits
        |  FROM grid g LEFT JOIN cb ON g.c = cb.c AND g.b = cb.b
        |  JOIN pri ON g.c = pri.c),
        |test AS (SELECT * FROM feat WHERE doc_id % $NbTestMod = 0),
        |scored AS (
        |  SELECT t.doc_id, t.lang, m.c, m.pbits,
        |    sum(t.n * m.wbits)::BIGINT + m.pbits AS score
        |  FROM test t JOIN model m USING (b)
        |  GROUP BY t.doc_id, t.lang, m.c, m.pbits),
        |pred AS (
        |  SELECT doc_id, lang, c AS pred FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, c) AS rn FROM scored) WHERE rn = 1)
        |SELECT lang, count(*) AS n_test,
        |  count(CASE WHEN pred = lang THEN 1 END) AS n_correct,
        |  (count(CASE WHEN pred = lang THEN 1 END) * 10000 // count(*))
        |    ::BIGINT AS accuracy_bp
        |FROM pred GROUP BY lang ORDER BY lang""".stripMargin,
    // bi MATERIALIZED: the hashed feature stream feeds four consumers
    // (raw counts, target counts, totals, scoring join); floor division
    // on the double quotient both sides — see t26DsirScore scaladoc
    "t26_dsir_score" ->
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |bi AS MATERIALIZED (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5(w[i] || ' ' || w[i+1]), 1, 8))::BIGINT
        |      % $DsirBuckets AS b
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        |        FROM toks WHERE len(w) >= 2)),
        |raw AS (SELECT b, count(*)::BIGINT AS c_r FROM bi GROUP BY b),
        |tgt AS (SELECT b, count(*)::BIGINT AS c_t FROM bi
        |        WHERE source = '$DsirTargetSource' GROUP BY b),
        |tot AS (SELECT count(*)::BIGINT AS n_r,
        |    count(CASE WHEN source = '$DsirTargetSource' THEN 1 END)::BIGINT
        |      AS n_t
        |  FROM bi),
        |wts AS (
        |  SELECT raw.b,
        |    ((length(bin(coalesce(c_t, 0) + 1)) - length(bin(c_r + 1)))
        |     + (length(bin(n_r + 1)) - length(bin(n_t + 1))))::BIGINT AS bits
        |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot),
        |perdoc AS (
        |  SELECT doc_id, source, count(*) AS n_bi,
        |    CAST(floor((sum(bits) * 100) / count(*)) AS BIGINT)
        |      AS avg_centibits
        |  FROM bi JOIN wts USING (b) GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        |  CAST(floor(sum(avg_centibits) / count(*)) AS BIGINT)
        |    AS mean_centibits,
        |  count(CASE WHEN avg_centibits >= $DsirSelectCentibits THEN 1 END)
        |    ::BIGINT AS n_selected
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "t25_bigram_surprisal" ->
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, source, w[i] AS w1, w[i+1] AS w2
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        |        FROM toks WHERE len(w) >= 2)),
        |big AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bi
        |        GROUP BY w1, w2
        |        ORDER BY c2 DESC, w1, w2 LIMIT $BigramVocab),
        |uni AS (SELECT b.w1, count(*)::BIGINT AS c1 FROM bi b
        |        WHERE b.w1 IN (SELECT w1 FROM big) GROUP BY b.w1),
        |scored AS (
        |  SELECT b.doc_id, b.source,
        |    CASE WHEN g.c2 IS NOT NULL
        |      THEN (length(bin(u.c1)) - length(bin(g.c2)))::BIGINT
        |      ELSE ${BigramBackoffBits}::BIGINT END AS bits
        |  FROM bi b LEFT JOIN big g ON b.w1 = g.w1 AND b.w2 = g.w2
        |            LEFT JOIN uni u ON b.w1 = u.w1),
        |perdoc AS (
        |  SELECT doc_id, source, count(*) AS n_bi,
        |    (sum(bits) * 100) // count(*) AS avg_centibits
        |  FROM scored GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        |  (sum(avg_centibits) // count(*))::BIGINT AS mean_centibits,
        |  count(CASE WHEN avg_centibits <= $BigramHeadCentibits THEN 1 END)::BIGINT
        |    AS n_head,
        |  count(CASE WHEN avg_centibits > $BigramHeadCentibits THEN 1 END)::BIGINT
        |    AS n_tail
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "t24_learned_bpe_apply" -> t24OracleSql,
    "t23_bpe_train" -> t23OracleSql,
    "t22_oov_eval" ->
      s"""WITH vocab AS (
        |  SELECT word, count(*) AS n_occ
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |topv AS (
        |  SELECT word FROM vocab
        |  ORDER BY n_occ DESC, word LIMIT $VocabTopK),
        |toks AS (
        |  SELECT lang, source, word FROM (
        |    SELECT lang, source,
        |      unnest(string_split(text, ' ')) AS word
        |    FROM documents)
        |  WHERE word <> '')
        |SELECT lang, source,
        |  count(*) AS n_tokens,
        |  count(CASE WHEN v.word IS NULL THEN 1 END) AS n_oov,
        |  count(DISTINCT CASE WHEN v.word IS NULL THEN toks.word END)
        |    AS n_oov_types,
        |  CAST(count(CASE WHEN v.word IS NULL THEN 1 END) * 10000
        |    // count(*) AS BIGINT) AS oov_bp
        |FROM toks LEFT JOIN topv v ON toks.word = v.word
        |GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    "t21_repetition_filters" ->
      s"""WITH docs AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w,
        |    length(replace(text, ' ', '')) AS chars
        |  FROM documents),
        |g2 AS (SELECT doc_id, 2 AS n, array_to_string(w[i:i+1], ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
        |        FROM docs WHERE len(w) >= 2)),
        |g3 AS (SELECT doc_id, 3 AS n, array_to_string(w[i:i+2], ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i
        |        FROM docs WHERE len(w) >= 3)),
        |cnt AS (SELECT doc_id, n, g, count(*) AS c
        |  FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g3)
        |  GROUP BY 1, 2, 3),
        |top AS (SELECT doc_id, n, c * (length(g) - (n - 1)) AS topchars
        |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
        |          ORDER BY c DESC, g) AS rn FROM cnt) WHERE rn = 1),
        |dup2 AS (SELECT doc_id, sum(c * (length(g) - 1)) AS dupchars
        |  FROM cnt WHERE n = 2 AND c > 1 GROUP BY doc_id),
        |per AS (SELECT d.doc_id, d.lang, d.source,
        |    coalesce(t2.topchars, 0) * 10000 // d.chars AS top2_bp,
        |    coalesce(t3.topchars, 0) * 10000 // d.chars AS top3_bp,
        |    coalesce(dup2.dupchars, 0) * 10000 // d.chars AS dup2_bp
        |  FROM docs d
        |  LEFT JOIN (SELECT doc_id, topchars FROM top WHERE n = 2) t2
        |    USING (doc_id)
        |  LEFT JOIN (SELECT doc_id, topchars FROM top WHERE n = 3) t3
        |    USING (doc_id)
        |  LEFT JOIN dup2 USING (doc_id))
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(top2_bp) // count(*) AS BIGINT) AS mean_top2_bp,
        |  CAST(count(*) FILTER (top2_bp > $RepTop2Bp) AS BIGINT)
        |    AS n_fail_top2,
        |  CAST(count(*) FILTER (top3_bp > $RepTop3Bp) AS BIGINT)
        |    AS n_fail_top3,
        |  CAST(count(*) FILTER (dup2_bp > $RepDup2Bp) AS BIGINT)
        |    AS n_fail_dup2,
        |  CAST(count(*) FILTER (top2_bp <= $RepTop2Bp
        |    AND top3_bp <= $RepTop3Bp AND dup2_bp <= $RepDup2Bp) AS BIGINT)
        |    AS n_pass
        |FROM per GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "t20_bpe_apply" ->
      s"""WITH perdoc AS (
        |  SELECT lang, source,
        |    len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS n_words,
        |    length(replace(text, ' ', '')) AS n_chars,
        |    list_sum(list_transform(
        |      list_filter(string_split(text, ' '), x -> x <> ''),
        |      w -> len(string_split(trim($bpeChainSql), ' ')))) AS n_bpe
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS words_total,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |  CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(n_bpe) * 10000 // sum(n_chars) AS BIGINT)
        |    AS tokens_per_char_bp
        |FROM perdoc GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // the same k-th-smallest order statistic over the same histogram;
    // integer k, no percentile interpolation anywhere
    "t17_relative_filter" ->
      s"""WITH hist AS (
        |  SELECT source, n_chars, count(*) AS c
        |  FROM documents GROUP BY source, n_chars),
        |cum AS (
        |  SELECT source, n_chars, c,
        |    sum(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum
        |  FROM hist),
        |tot AS (SELECT source, sum(c) AS n FROM hist GROUP BY source),
        |cutoff AS (
        |  SELECT cum.source, min(n_chars) AS cutoff_chars
        |  FROM cum JOIN tot USING (source)
        |  WHERE cum.cum >= (tot.n - 1) // $RelFilterPct + 1
        |  GROUP BY cum.source)
        |SELECT h.source, CAST(sum(h.c) AS BIGINT) AS n_docs,
        |  min(co.cutoff_chars) AS cutoff_chars,
        |  CAST(sum(CASE WHEN h.n_chars >= co.cutoff_chars
        |               THEN h.c ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN h.n_chars >= co.cutoff_chars
        |               THEN h.n_chars * h.c ELSE 0 END) AS BIGINT)
        |    AS kept_chars
        |FROM hist h JOIN cutoff co USING (source)
        |GROUP BY h.source ORDER BY source""".stripMargin,
    // same integer surprisal: strlen(bin(x)) = floor(log2 x) + 1 in
    // both engines (unpadded binary), so no log/float anywhere
    "t19_lm_surprisal" ->
      s"""WITH words AS (
        |  SELECT doc_id, source, word
        |  FROM (SELECT doc_id, source,
        |        unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> ''),
        |vocab AS (SELECT word, count(*) AS n_occ FROM words GROUP BY word),
        |nn AS (SELECT CAST(sum(n_occ) AS BIGINT) AS n FROM vocab),
        |perdoc AS (
        |  SELECT doc_id, source, count(*) AS n_tok,
        |    sum(strlen(bin(nn.n)) - strlen(bin(v.n_occ))) AS bits_sum
        |  FROM words JOIN vocab v USING (word) CROSS JOIN nn
        |  GROUP BY doc_id, source),
        |scored AS (
        |  SELECT source, (bits_sum * 100) // n_tok AS avg_centibits
        |  FROM perdoc)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(avg_centibits) // count(*) AS BIGINT) AS mean_centibits,
        |  count(CASE WHEN avg_centibits <= $HeadCentibits THEN 1 END) AS n_head,
        |  count(CASE WHEN avg_centibits > $HeadCentibits THEN 1 END) AS n_tail
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    // same (count desc, word asc) total order; coverage is integral
    "t28_vocab_growth" ->
      s"""WITH m AS (SELECT max(doc_id) + 1 AS mm FROM documents),
        |wf AS (
        |  SELECT word, min(doc_id) AS first_doc FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |    FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |vb AS (
        |  SELECT (first_doc * $GrowthBuckets) // mm + 1 AS bucket,
        |    count(*) AS v
        |  FROM wf, m GROUP BY 1),
        |db AS (
        |  SELECT (doc_id * $GrowthBuckets) // mm + 1 AS bucket,
        |    count(*) AS nd,
        |    sum(len(list_filter(string_split(text, ' '),
        |      w -> w <> ''))) AS nt
        |  FROM documents, m GROUP BY 1),
        |b AS (
        |  SELECT db.bucket, nd, nt, coalesce(v, 0) AS v
        |  FROM db LEFT JOIN vb ON db.bucket = vb.bucket)
        |SELECT bucket,
        |  CAST(sum(nd) OVER w AS BIGINT) AS n_docs,
        |  CAST(sum(nt) OVER w AS BIGINT) AS n_tokens,
        |  CAST(sum(v) OVER w AS BIGINT) AS vocab_size
        |FROM b WINDOW w AS (ORDER BY bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin,
    "t18_vocab" ->
      s"""WITH vocab AS (
        |  SELECT word, count(*) AS n_occ
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |tot AS (SELECT sum(n_occ) AS total FROM vocab),
        |ranked AS (
        |  SELECT word, n_occ,
        |    row_number() OVER (ORDER BY n_occ DESC, word) AS rank
        |  FROM vocab)
        |SELECT rank, word, n_occ,
        |  CAST(sum(n_occ) OVER (ORDER BY rank) * 10000 // tot.total
        |    AS BIGINT) AS cum_coverage_bp
        |FROM ranked CROSS JOIN tot
        |WHERE rank <= $VocabTopK
        |ORDER BY rank""".stripMargin,
    // chars_kept's closed form (sum of segment lengths + count-1 join
    // spaces) pins the Spark side's actual array_join reconstruction
    "t16_line_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, lang, source, i AS p,
        |    array_to_string(w[i*8+1:i*8+8], ' ') AS seg,
        |    doc_id * 1048576 + i AS pk
        |  FROM (SELECT doc_id, lang, source, w,
        |        unnest(range(0, (len(w) - 1) // 8 + 1)) AS i FROM docs)),
        |winners AS (SELECT seg, min(pk) AS wk FROM segs GROUP BY seg),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    sum(strlen(seg)) + count(*) - 1 AS chars_kept
        |  FROM segs JOIN winners USING (seg)
        |  WHERE pk = wk GROUP BY doc_id),
        |docsegs AS (
        |  SELECT doc_id, lang, source, count(*) AS n_segs
        |  FROM segs GROUP BY doc_id, lang, source)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_segs) AS BIGINT) AS segs_total,
        |  CAST(coalesce(sum(p.n_kept), 0) AS BIGINT) AS segs_kept,
        |  CAST(coalesce(sum(p.chars_kept), 0) AS BIGINT) AS chars_kept
        |FROM docsegs LEFT JOIN perdoc p USING (doc_id)
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // idf factored out of the per-doc sum: score = tf_total * ln(N/df),
    // one double multiply on integer inputs — bit-identical both engines
    "t15_tfidf_terms" ->
      """WITH w AS (
        |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT source, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |dfx AS (SELECT word, count(DISTINCT doc_id) AS df_docs FROM w GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT source, word, tf, df_docs,
        |    tf * ln(n_docs / df_docs) AS score
        |  FROM tf JOIN dfx USING (word) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |         ORDER BY score DESC, word) AS rn
        |      FROM scored)
        |SELECT source, CAST(rn AS BIGINT) AS rn, word, tf,
        |  CAST(df_docs AS BIGINT) AS df_docs, round(score, 6) AS tfidf
        |FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "t14_classifier_score" ->
      s"""WITH scored AS (
        |  SELECT lang, source,
        |    CAST(list_sum(list_transform(
        |      list_distinct(string_split(text, ' ')),
        |      x -> ((('0x' || substring(md5(x), 1, 8))::BIGINT % $ClsBuckets)
        |            * 2654435761) % 997 - 498)) AS BIGINT) AS score
        |  FROM documents)
        |SELECT lang, source, count(*) AS n_docs,
        |  count(CASE WHEN score > 0 THEN 1 END) AS n_positive,
        |  CAST(sum(score) AS BIGINT) AS sum_score,
        |  min(score) AS min_score, max(score) AS max_score
        |FROM scored GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "t13_rarity_filter" ->
      s"""WITH w AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |vc AS (SELECT word, count(*) AS c FROM w GROUP BY word),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM vc),
        |topk AS (
        |  SELECT word, total // c AS inv FROM vc, tot
        |  ORDER BY c DESC, word LIMIT $TopVocab),
        |scored AS (
        |  SELECT w.doc_id, w.lang, count(*) AS n_words,
        |    CAST(sum(coalesce(k.inv, 2 * (SELECT total FROM tot)))
        |      AS BIGINT) AS rarity,
        |    CAST(count(CASE WHEN k.inv IS NULL THEN 1 END) AS BIGINT) AS n_oov
        |  FROM w LEFT JOIN topk k ON w.word = k.word
        |  GROUP BY w.doc_id, w.lang)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(count(CASE WHEN n_oov * 10 > n_words THEN 1 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(sum(rarity) AS BIGINT) AS sum_rarity,
        |  min(rarity) AS min_rarity, max(rarity) AS max_rarity
        |FROM scored GROUP BY lang ORDER BY lang""".stripMargin,
    "t12_chunking" ->
      s"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n,
        |    CASE WHEN n <= $ChunkTokens THEN 1
        |      ELSE (n - $ChunkTokens + ${ChunkStride - 1}) // $ChunkStride + 1
        |    END AS n_chunks
        |  FROM d),
        |ch AS (
        |  SELECT doc_id, source, n, n_chunks,
        |    unnest(range(0, n_chunks)) AS chunk_idx
        |  FROM c)
        |SELECT source,
        |  CAST(count(CASE WHEN chunk_idx = 0 THEN 1 END) AS BIGINT) AS n_docs,
        |  count(*) AS n_chunks_total,
        |  CAST(sum(least($ChunkTokens, n - chunk_idx * $ChunkStride))
        |    AS BIGINT) AS sum_chunk_tokens,
        |  CAST(max(n_chunks) AS BIGINT) AS max_chunks_per_doc
        |FROM ch GROUP BY source ORDER BY source""".stripMargin,
    "t11_pii_redact" ->
      s"""WITH w AS (
        |  SELECT source, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' reach me at user' ||
        |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-' ||
        |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |      lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |      CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END AS raw
        |  FROM documents),
        |c AS (
        |  SELECT source, raw,
        |    len(regexp_extract_all(raw, '$EmailRe')) AS n_email,
        |    len(regexp_extract_all(raw, '$PhoneRe')) AS n_phone,
        |    len(regexp_extract_all(raw, '$IpRe')) AS n_ip,
        |    regexp_replace(regexp_replace(regexp_replace(raw,
        |      '$EmailRe', '<EMAIL>', 'g'),
        |      '$PhoneRe', '<PHONE>', 'g'),
        |      '$IpRe', '<IP>', 'g') AS clean
        |  FROM w)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 END)
        |    AS BIGINT) AS docs_with_pii,
        |  CAST(sum(n_email) AS BIGINT) AS emails_redacted,
        |  CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
        |  CAST(sum(n_ip) AS BIGINT) AS ips_redacted,
        |  CAST(sum(length(raw) - length(clean)) AS BIGINT) AS chars_delta
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "t10_domain_mix" ->
      s"""WITH p AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT sum(actual_tokens)::DOUBLE AS total_tokens FROM p)
        |SELECT lang, n_docs, actual_tokens,
        |  round(least(1.0, (total_tokens * $TargetShare) / actual_tokens), 6)
        |    AS weight,
        |  CAST(round(actual_tokens *
        |    round(least(1.0, (total_tokens * $TargetShare) / actual_tokens), 6),
        |    0) AS BIGINT) AS expected_tokens
        |FROM p, tot ORDER BY lang""".stripMargin,
    "t09_blocklist_scrub" ->
      s"""WITH d AS (
        |  SELECT source,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_filter(string_split(text, ' '), x -> $blockedSql)) AS n_hits,
        |    coalesce(list_sum(list_apply(
        |      list_filter(string_split(text, ' '), x -> NOT ($blockedSql)),
        |      x -> length(x))), 0) AS chars_after
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(CASE WHEN n_hits > 0 THEN 1 END) AS BIGINT) AS n_docs_hit,
        |  CAST(sum(n_hits) AS BIGINT) AS total_redactions,
        |  CAST(sum(n_words) AS BIGINT) AS tokens_before,
        |  CAST(sum(n_words - n_hits) AS BIGINT) AS tokens_after,
        |  CAST(sum(chars_after) AS BIGINT) AS chars_after
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "t08_sequence_packing" ->
      """WITH d AS (
        |  SELECT lang, source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, source, doc_id, toks,
        |    sum(toks) OVER (PARTITION BY lang, source ORDER BY doc_id
        |                    ROWS UNBOUNDED PRECEDING) - toks AS start_off
        |  FROM d)
        |SELECT lang, source, CAST(floor(start_off / 2048) AS BIGINT) AS chunk,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY lang, source, chunk
        |ORDER BY lang, source, chunk""".stripMargin,
    "t06_gopher_filters" ->
      """WITH d AS (
        |  SELECT lang, source,
        |    len(string_split(text, ' ')) AS n_words,
        |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        |      / len(string_split(text, ' ')) AS mean_word_len,
        |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stop,
        |    len(list_distinct(string_split(text, ' ')))::DOUBLE
        |      / len(string_split(text, ' ')) AS distinct_ratio
        |  FROM documents),
        |r AS (
        |  SELECT lang, source,
        |    (n_words >= 20 AND n_words <= 1000) AS ok_len,
        |    (mean_word_len >= 4.2 AND mean_word_len <= 10.0) AS ok_wordlen,
        |    (n_stop >= 2) AS ok_stop,
        |    (distinct_ratio >= 0.3) AS ok_rep
        |  FROM d)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(count(CASE WHEN ok_len AND ok_wordlen AND ok_stop AND ok_rep THEN 1 END) AS BIGINT) AS n_pass,
        |  CAST(count(CASE WHEN NOT ok_len THEN 1 END) AS BIGINT) AS n_fail_wordcount,
        |  CAST(count(CASE WHEN NOT ok_wordlen THEN 1 END) AS BIGINT) AS n_fail_wordlen,
        |  CAST(count(CASE WHEN NOT ok_stop THEN 1 END) AS BIGINT) AS n_fail_stop,
        |  CAST(count(CASE WHEN NOT ok_rep THEN 1 END) AS BIGINT) AS n_fail_repetition
        |FROM r GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "t01_langid" -> {
      val scores = markers.map { case (l, _) =>
        s"len(list_filter(string_split(text, ' '), x -> ${markerSql(l)})) AS s_$l"
      }.mkString(",\n        |    ")
      val mx = markers.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      val caseChain = markers.map { case (l, _) =>
        s"WHEN s_$l = mx THEN '$l'"
      }.mkString(" ")
      s"""WITH scored AS (
        |  SELECT doc_id, lang,
        |    $scores
        |  FROM documents),
        |pred AS (
        |  SELECT lang, CASE $caseChain ELSE '??' END AS pred_lang
        |  FROM (SELECT *, $mx AS mx FROM scored))
        |SELECT lang, pred_lang, count(*) AS n_docs
        |FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
    },
    "t02_quality_score" ->
      """WITH d AS (
        |  SELECT lang,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stop,
        |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        |      / len(string_split(text, ' ')) AS avg_word_len
        |  FROM documents),
        |q AS (
        |  SELECT lang, n_words, n_stop::DOUBLE / n_words AS stop_ratio,
        |    round(1.0 / (1.0 + exp(-(avg_word_len - 4.0)))
        |      * (1.0 - n_stop::DOUBLE / n_words), 6) AS quality
        |  FROM d)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(n_words), 6) AS avg_n_words,
        |  round(avg(stop_ratio), 6) AS avg_stop_ratio,
        |  round(avg(quality), 6) AS avg_quality,
        |  CAST(count(CASE WHEN quality < 0.4 THEN 1 END) AS BIGINT) AS n_low_quality
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    "t03_token_count" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\S'))) AS BIGINT) AS total_bpe_tokens,
        |  round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\S'))), 6) AS avg_bpe_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "t04_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t07_bm25" -> t07OracleSql,
    "t05_prep_pipeline" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, text,
        |    md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fingerprint,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stop,
        |    (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
        |      / len(string_split(text, ' ')) AS avg_word_len
        |  FROM documents),
        |q AS (
        |  SELECT *, round(1.0 / (1.0 + exp(-(avg_word_len - 4.0)))
        |    * (1.0 - n_stop::DOUBLE / n_words), 6) AS quality
        |  FROM d),
        |dd AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fingerprint
        |                                 ORDER BY doc_id) AS rn
        |    FROM q) WHERE rn = 1),
        |kept AS (SELECT * FROM dd WHERE quality >= 0.4)
        |SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|\S'))) AS BIGINT)
        |    AS total_tokens,
        |  round(avg(quality), 4) AS avg_quality
        |FROM kept GROUP BY lang, source ORDER BY lang, source""".stripMargin,
  )
}
