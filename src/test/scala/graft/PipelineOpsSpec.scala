package graft

import org.apache.spark.sql.functions._
import graft.ext.{ClusterQueries, DedupQueries, TextQueries}

/** Pins the round-8 pipeline operators: boilerplate n-gram detection
  * (d12), blocklist scrubbing (t09), and deterministic k-means topic
  * clustering (d13) — each on a constructed corpus with a hand-computed
  * expected answer.
  */
class PipelineOpsSpec extends SparkSpec {

  test("s21 packs the MAXIMAL budget-fitting prefix of each fused list") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val packed = graft.ext.SimilarityQueries
      .queries("s21_context_pack")(spark, sf).collect()
    assert(packed.nonEmpty)
    val byQ = packed.groupBy(_.getLong(0))
    // prefix property: ranks are 1..n with no gaps, cumsum consistent
    byQ.foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq,
        s"query $q packed a non-prefix of the fused ranking")
      val cum = rows.sortBy(_.getLong(1)).map(_.getLong(3)).scanLeft(0L)(_ + _)
      assert(rows.sortBy(_.getLong(1)).map(_.getLong(4)).toSeq == cum.tail.toSeq)
    }
    // maximality: the first UNPACKED candidate (if any) must overflow
    val fused = graft.ext.SimilarityQueries
      .queries("s14_hybrid_rrf")(spark, sf)
      .select(col("query_id"), col("frank"), col("doc_id")).collect()
    // null text → null token count (size(split(null)) is null); skip
    // like the production join does, instead of NPE-ing on getLong
    val toks = graft.rel.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("t"))
      .collect().flatMap(r =>
        if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getLong(1)))
      .toMap
    fused.groupBy(_.getLong(0)).foreach { case (q, cands) =>
      val packedN = byQ.get(q).map(_.length).getOrElse(0)
      val packedSum = byQ.get(q)
        .map(_.map(_.getLong(3)).sum).getOrElse(0L)
      cands.sortBy(_.getLong(1)).drop(packedN).headOption.foreach { next =>
        toks.get(next.getLong(2)).foreach { nextToks =>
          assert(packedSum + nextToks > 256L,
            s"query $q stopped early: next candidate still fits the budget")
        }
      }
    }
  }

  test("d12 flags documents covered by a cross-document template 3-gram") {
    import spark.implicits._
    val dir = tmpDir("boiler")
    // 6 docs share the template shingle "alpha beta gamma"; each doc has
    // 6 words → 4 distinct shingles, exactly 1 of them boilerplate
    // (frequency 6 ≥ 5) → frac 0.25, over the 0.2 flag threshold.
    // 4 docs in source s1 share nothing (frequency 4 < 5 even for their
    // common template) → frac 0.
    val docs =
      (0 until 6).map(i =>
        (i.toLong, s"alpha beta gamma w$i x$i y$i", "en", "s0")) ++
      (10 until 14).map(i =>
        (i.toLong, s"p$i q$i r$i common tail pair", "en", "s1"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.d12BoilerplateNgrams(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      ("en", "s0", 6L, 6L, 0.25, 6L),
      ("en", "s1", 4L, 0L, 0.0, 0L)))
  }

  test("d14 positional coverage unions overlapping frequent-gram windows") {
    import spark.implicits._
    val dir = tmpDir("substr")
    // 5 docs carry the template once (covers positions 0-2 of 6 → 0.5);
    // the 6th carries it TWICE, back to back — its two 3-token windows
    // must union to all 6 positions, not double-count
    val docs =
      (0 until 5).map(i =>
        (i.toLong, s"alpha beta gamma w$i x$i y$i", "en", "s0")) :+
      (9L, "alpha beta gamma alpha beta gamma", "en", "s0")
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.d14SubstringScrub(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // covered: 5×3 + 6 = 21 of 36 tokens; fracs avg([0.5]*5 :+ 1.0)
    assert(rows.toSeq == Seq(("en", "s0", 6L, 6L, 36L, 21L, 0.583333)))
  }

  test("t09 redaction counts match a hand-scrubbed corpus") {
    import spark.implicits._
    val dir = tmpDir("scrub")
    val docs = Seq(
      // 2 hits ("customer", "dup"), 3 kept words of 3+5+4=12 chars
      (1L, "customer one likes dup much", "en", "a"),
      // no hits, 2 kept words of 5+5=10 chars
      (2L, "clean words", "en", "a"),
      // 3 hits (vector twice + dup), 1 kept word of 4 chars
      (3L, "vector dup vector word", "en", "b"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.t09BlocklistScrub(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      //        n_docs hit redact before after chars
      ("a", 2L, 1L, 2L, 7L, 5L, 22L),
      ("b", 1L, 1L, 3L, 4L, 1L, 4L)))
  }

  test("whole-corpus shingling survives documents too short to shingle") {
    import spark.implicits._
    val dir = tmpDir("shortdoc")
    // doc 0 is the benchmark row (id % 50 == 0); docs 2-3 are shorter
    // than one 3-gram — sequence(0, n<0) is DESCENDING in Spark, so an
    // unguarded shingle expression throws on them at runtime
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s0"),
      (1L, "x1 alpha beta gamma y1", "en", "s0"),
      (2L, "one", "en", "s0"),
      (3L, "two words", "fr", "s0"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // d08: short docs count in n_docs, contaminate nothing
    val d08 = DedupQueries.d08Decontaminate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(d08 == Seq(("en", 2L, 1L), ("fr", 1L, 0L)))
    // st08 agrees with d08 on the same corpus
    val st08 = graft.streaming.StreamOps.st08StreamDecontaminate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(st08 == d08)
    // d12 (which filters to shingleable docs) still runs clean
    assert(DedupQueries.d12BoilerplateNgrams(spark, dir).collect().nonEmpty)
  }

  test("t10 domain-mix weights hit the target token share") {
    import spark.implicits._
    val dir = tmpDir("mix")
    // en: 20 tokens over 2 docs; fr: 5 tokens. total 25, target share
    // 0.2 → 5 tokens per lang: en weight 0.25, fr capped at 1.0
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "en", "s0"),
      (2L, Seq.fill(10)("w").mkString(" "), "en", "s0"),
      (3L, Seq.fill(5)("w").mkString(" "), "fr", "s0"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.t10DomainMix(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.toSeq == Seq(("en", 2L, 20L, 0.25, 5L), ("fr", 1L, 5L, 1.0, 5L)))
  }

  test("st08 streaming decontamination flags exactly the docs sharing a benchmark shingle") {
    import spark.implicits._
    val dir = tmpDir("stdecon")
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s0"),   // benchmark (id % 50 == 0)
      (1L, "x1 alpha beta gamma y1", "en", "s0"),   // shares "alpha beta gamma"
      (2L, "p2 q2 r2 s2 t2", "en", "s0"),           // clean
      (3L, "beta gamma delta z3 w3", "fr", "s0"))   // shares "beta gamma delta"
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.streaming.StreamOps.st08StreamDecontaminate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("en", 2L, 1L, 1L), ("fr", 1L, 1L, 1L)))
  }

  test("d13 k-means separates well-separated groups with pure labels") {
    import spark.implicits._
    val dir = tmpDir("kmeans")
    // 40 vectors in 4 orthogonal groups (axes 0,1,2,3), label = group.
    // vec_ids 0-7 (the fixed initial centroids) cover all 4 groups; the
    // rest carry small deterministic jitter on a distinct axis.
    val dim = 64
    val vecs = (0 until 40).map { i =>
      val g = i % 4
      val e = Array.fill(dim)(0.0f)
      e(g) = 1.0f
      e(8 + (i % 7)) = 0.01f * ((i % 5) + 1)
      (i.toLong, e.toSeq, g)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = ClusterQueries.d13KmeansTopics(spark, dir).collect()
    // every vector lands in exactly one cluster…
    assert(rows.map(_.getLong(1)).sum == 40L)
    // …and no cluster mixes groups: modal label accounts for ALL members
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(1),
        s"cluster ${r.getLong(0)} mixes labels: $r")
    }
    // the 4 groups remain separated: 4 distinct modal labels
    assert(rows.map(_.getInt(4)).toSet == Set(0, 1, 2, 3))
  }

  test("s18 nDCG is consistent with s10 recall: perfect recall implies perfect nDCG") {
    val sf = "/root/testdata/sf0.001"
    val ndcg = graft.ext.SimilarityQueries.queries("s18_ndcg_eval")(spark, sf)
      .collect().map(r => r.getLong(r.fieldIndex("query_id")) ->
        r.getLong(r.fieldIndex("ndcg_bp"))).toMap
    val recall = graft.ext.SimilarityQueries.queries("s10_recall_eval")(spark, sf)
      .collect().map(r => r.getLong(r.fieldIndex("query_id")) ->
        r.getLong(r.fieldIndex("recall_bp"))).toMap
    assert(ndcg.keySet == recall.keySet)
    ndcg.foreach { case (q, bp) =>
      assert(bp >= 0 && bp <= 10000, s"query $q: ndcg_bp $bp out of range")
      // recall@k = 100% means the IVF set EQUALS the exact set; nDCG can
      // still be < 1 only through ORDER — but identical sets with the
      // same (cos desc, vec_id) tie-broken ranking ranks identically,
      // so full recall must pin full nDCG. The converse is not implied.
      if (recall(q) == 10000)
        assert(bp == 10000,
          s"query $q: recall 100% but ndcg_bp $bp — ranking diverged on an identical set")
      else
        assert(bp < 10000,
          s"query $q: a missed exact neighbor must cost position gain")
    }
  }

  test("the driver's flagship smoke entry returns rows") {
    // SparkEntry.entry is called by the DRIVER only (rows > 0 smoke);
    // nothing else in the repo exercises it, so a regression there
    // would surface first in the round gate — pin it in the suite
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("s20 learned rerank beats the fusion-only ordering on held-out queries") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ext.SimilarityQueries
      .queries("s20_learned_rerank")(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getString(r.fieldIndex("split")),
        r.getLong(r.fieldIndex("ndcg_fused_bp")),
        r.getLong(r.fieldIndex("ndcg_rr_bp"))))
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, f, rr) =>
      assert(f >= 0 && f <= 10000 && rr >= 0 && rr <= 10000,
        s"query $q: nDCG out of range (fused=$f, rr=$rr)")
    }
    // the entry's claim: the learned ordering improves on RRF fusion
    // where it counts — queries the model never trained on. Mean over
    // the held-out half, not per-query (a single query may tie).
    val held = rows.filter(_._2 == "held_out")
    assert(held.nonEmpty, "the held-out split must be populated")
    // compare SUMS (same divisor): a truncating integer mean could
    // collapse a genuine sub-1bp improvement into a false tie.
    // NON-strict (>=): the suite pins "never makes retrieval worse" —
    // a 3-feature model on a handful of fixed-fixture queries can
    // legitimately TIE after a testdata regeneration or a TopK/FusedK
    // change, and that is not a code bug (ADVICE r15). The strict
    // improvement lives in the round-notes evidence, where it is
    // re-measured against the data that produced it.
    val (fusedSum, rrSum) = (held.map(_._3).sum, held.map(_._4).sum)
    assert(rrSum >= fusedSum,
      s"held-out mean nDCG must not degrade: fused total=$fusedSum " +
        s"rr total=$rrSum over ${held.size} queries")
    assert(rows.map(_._2).toSet == Set("train", "held_out"),
      "both split populations must reach the gate hash")
  }

  test("t26 DSIR scores the target slice highest and selects all of it") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextQueries.queries("t26_dsir_score")(spark, sf).collect()
    val bySource = rows.map(r => r.getString(r.fieldIndex("source")) ->
      (r.getLong(r.fieldIndex("mean_centibits")),
        r.getLong(r.fieldIndex("n_docs")),
        r.getLong(r.fieldIndex("n_selected")))).toMap
    val (tgtMean, tgtDocs, tgtSel) = bySource("src0")
    // the importance weight is log p_target/p_raw: the target slice's own
    // documents must be the most target-like on average, and every one of
    // them should clear the >= 0 (more-target-than-raw) selection bar
    bySource.foreach { case (src, (mean, _, _)) =>
      if (src != "src0")
        assert(mean < tgtMean,
          s"$src mean $mean >= target slice mean $tgtMean")
    }
    assert(tgtSel == tgtDocs,
      s"target slice selected $tgtSel of $tgtDocs of its own documents")
  }

  test("t27 NB core reaches perfect accuracy on a lexically separable corpus") {
    import spark.implicits._
    // two classes with DISJOINT vocabularies: any functioning learner
    // must separate them perfectly; the real corpus's uniform vocab
    // (31 words, every lang ~33 per-mille) is covered by the oracle
    // gate, this pins that the model LEARNS when signal exists
    val docs = (0 until 40).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val words = if (lang == "aa") Seq("apple", "ant", "axe", "acorn")
      else Seq("bear", "bolt", "barn", "brick")
      // vary composition per doc so train docs are not all identical
      val text = (0 until 12).map(j => words((i + j) % 4)).mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val feat = TextQueries.nbFeatures(docs)
    val out = TextQueries.nbClassifierCore(feat, 512, 5).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("accuracy_bp")) == 10000,
        s"${r.getString(r.fieldIndex("lang"))}: expected perfect accuracy " +
          s"on disjoint vocab, got ${r.getLong(r.fieldIndex("accuracy_bp"))}")
    }
  }

  test("t25 core at a small K: truncation tie-break, backoff branch, head-restricted unigrams") {
    import spark.implicits._
    // pairs: doc1(a) = (x,x),(x,y); doc2(a) = (x,x); doc3(b) = (y,z)
    // counts: (x,x)=2, (x,y)=1, (y,z)=1. K=2 head by (c2 desc, w1, w2):
    // (x,x) then — tie at c2=1 broken on (w1,w2) — (x,y); (y,z) FALLS
    // OUT at the rank-K boundary. uni restricted to head lefts: only
    // x, c1(x)=3 (bitlen 2).
    val bi = Seq(
      (1L, "a", "x", "x"), (1L, "a", "x", "y"),
      (2L, "a", "x", "x"),
      (3L, "b", "y", "z"))
      .toDF("doc_id", "source", "w1", "w2")
    val out = graft.ext.TextQueries.bigramSurprisalCore(
      bi, headK = 2, backoffBits = 20L, headCentibits = 458)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // doc1: bits (2-2)+(2-1)=1 over 2 pairs -> 50 centibits; doc2: 0;
    // doc3: out-of-head pair -> backoff 20 bits -> 2000 centibits
    assert(out.toSeq == Seq(
      ("a", 2L, 25L, 2L, 0L),   // mean (50+0) div 2 = 25; both <= 458
      ("b", 1L, 2000L, 0L, 1L)))// pure-backoff doc lands in the tail
  }
}
