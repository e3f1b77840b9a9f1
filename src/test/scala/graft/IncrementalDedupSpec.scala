package graft

import org.apache.hadoop.fs.Path

import graft.ext.{DedupQueries, IncrementalDedup}
import graft.meta.GraftTable

/** Cross-run incremental dedup (d11): the signature index is persisted,
  * and a catch-up after new documents land shingles ONLY the new files
  * — pinned here via the incremental slice's input files — while the
  * pair result equals a from-scratch recomputation.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) => (id, text.length.toLong, text) }
      .toDF("doc_id", "n_chars", "text")

  test("catch-up shingles only the newly committed corpus files") {
    val dir = tmpDir("incdedcatch")
    val seed = (0 until 30).map(i =>
      (i.toLong, s"seed document number $i with some shared words here"))
    val batch = (100 until 105).map(i =>
      (i.toLong, s"new batch document $i with some shared words here"))
    val corpus = GraftTable.create(spark, s"$dir/corpus", docsDf(seed).schema)
    corpus.append(docsDf(seed))
    val shingles = DedupQueries.shingleRelation(corpus.read)
    val index = GraftTable.create(spark, s"$dir/index", shingles.schema)
    index.append(shingles)
    val root = new Path(dir, "root")
    val last = corpus.currentSnapshot.get.snapshotId
    IncrementalDedup.writeStamp(spark, root, last, "fp0")

    corpus.append(docsDf(batch))
    val head = corpus.currentSnapshot.get.snapshotId

    // scan-metric pin: the incremental slice the catch-up shingles
    // lists EXACTLY the files the batch commit added — none of the
    // seed's files are read again
    def norm(p: String): String = new Path(p).toUri.getPath
    val commit2Files = corpus.files
      .filter(org.apache.spark.sql.functions.col("added_snapshot_id") === head)
      .select("path").collect().map(r => norm(r.getString(0))).toSet
    val sliceFiles = corpus.readIncremental(last, head)
      .inputFiles.map(norm).toSet
    assert(sliceFiles.nonEmpty && sliceFiles == commit2Files,
      s"incremental slice must read only the batch files: " +
        s"slice=${sliceFiles.size}, batch=${commit2Files.size}")

    val indexed = IncrementalDedup.catchUp(corpus, index, root, "fp0", DedupQueries.shingleRelation)
    assert(indexed == batch.size.toLong)
    assert(index.read.count() == (seed.size + batch.size).toLong)
    assert(IncrementalDedup.readStamp(spark, root).contains((head, "fp0")))
    // caught up → a second catch-up indexes nothing
    assert(IncrementalDedup.catchUp(corpus, index, root, "fp0", DedupQueries.shingleRelation) == 0L)

    // crash-idempotence: simulate "index append committed, stamp write
    // died" by rewinding the stamp file to the pre-batch snapshot. The
    // range marker committed atomically with the slice must prevent a
    // re-append (duplicate index rows), and the rerun heals the stamp.
    IncrementalDedup.writeStamp(spark, root, last, "fp0")
    assert(IncrementalDedup.catchUp(corpus, index, root, "fp0",
      DedupQueries.shingleRelation) == 0L)
    assert(index.read.count() == (seed.size + batch.size).toLong,
      "a rewound stamp must not duplicate the already-committed slice")
    assert(IncrementalDedup.readStamp(spark, root).contains((head, "fp0")),
      "the healed stamp points at the marker's head again")
  }

  test("d11 equals a from-scratch recomputation and is repeatable") {
    val dir = tmpDir("incdedfull")
    // 1-2 identical (corpus-only near-dup: EXCLUDED from the result);
    // 3, 10, 20 identical (10 and 20 are in the %10 batch: every pair
    // among them touches the batch → INCLUDED); 4 unrelated
    val rows = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine",
      10L -> "one two three four five six seven eight nine",
      20L -> "one two three four five six seven eight nine",
      4L -> "completely different words nothing shared at all today")
    docsDf(rows).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    def run(): Seq[(Long, Long, Double)] =
      IncrementalDedup.d11IncrementalDedup(spark, dir)
        .as[(Long, Long, Double)].collect().toSeq
    val got = run()
    assert(got == Seq((3L, 10L, 1.0), (3L, 20L, 1.0), (10L, 20L, 1.0)),
      s"got $got")
    // second call serves from the caught-up persisted index, same rows
    assert(run() == got)
  }
}
