package graft

import org.apache.spark.sql.functions._

import graft.ext.SimilarityQueries

/** Lifecycle of the persisted IVF index behind s04: the index is keyed
  * by a fingerprint of its SOURCE data (per-file name/size/mtime — the
  * plain-parquet analogue of a source snapshot id) and must rebuild when
  * the source changes, never serve stale neighbors. */
class SimilarityIndexSpec extends SparkSpec {
  import spark.implicits._

  test("s04 index serves cached results while fresh, rebuilds when stale") {
    val dir = tmpDir("ivf")
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src.write.parquet(s"$dir/embeddings.parquet")

    val r1 = SimilarityQueries.s04IvfIndex(spark, dir).collect().toSeq
    assert(r1.nonEmpty)
    // unchanged source → identical result (served from the same index)
    assert(SimilarityQueries.s04IvfIndex(spark, dir).collect().toSeq == r1)

    // append EXACT DUPLICATES of the query vectors under fresh ids: each
    // query's new top-1 neighbor must be its duplicate at cosine 1.0 —
    // impossible to observe from a stale index
    val dup = src.filter($"vec_id" < 8)
      .withColumn("vec_id", $"vec_id" + 100000L)
    dup.write.mode("append").parquet(s"$dir/embeddings.parquet")

    val r2 = SimilarityQueries.s04IvfIndex(spark, dir).collect().toSeq
    assert(r2 != r1, "index must rebuild after a source append")
    val top1 = r2.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    (0L until 8L).foreach { q =>
      assert(top1(q) == (q + 100000L, 1.0),
        s"query $q: expected its duplicate at cos 1.0, got ${top1(q)}")
    }
    // ground truth: rebuilt index answers exactly like the inline IVF
    assert(r2 == SimilarityQueries.s02IvfTopK(spark, dir).collect().toSeq)
  }

  test("s04 build is seed + incremental catch-up, not one monolithic commit") {
    val dir = tmpDir("ivfinc")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = SimilarityQueries.s04IvfIndex(spark, dir).collect().toSeq
    // result still equals the inline IVF — catch-up indexing must not
    // change a single neighbor
    assert(r == SimilarityQueries.s02IvfTopK(spark, dir).collect().toSeq)
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_g$dirKey"
    val corpus = graft.meta.GraftTable.load(spark, s"$root/corpus")
    val index = graft.meta.GraftTable.load(spark, s"$root/index")
    // two index commits: the seed assignment and the overnight batch's
    // catch-up — never a full rebuild over the batch
    assert(index.snapshots.size == 2,
      s"expected seed+catchup commits, got ${index.snapshots.size}")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(index.read.count() == n)
    val batchRows = index.snapshots.last.totalRows -
      index.snapshots.head.totalRows
    assert(batchRows > 0 && batchRows < n / 2,
      s"catch-up commit must hold only the batch: $batchRows of $n")
  }

  test("IVF catch-up assigns only the newly committed corpus files") {
    import graft.meta.GraftTable
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("ivfcatch")
    def vecs(ids: Seq[Long]) =
      ids.map(i => (i, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
    val assign: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("cell_id", $"vec_id" % 4)
    val corpus = GraftTable.create(spark, s"$dir/corpus",
      vecs(Seq(1L)).schema)
    corpus.append(vecs(16L until 48L))
    val indexed = assign(corpus.read)
    val index = GraftTable.create(spark, s"$dir/index", indexed.schema)
    index.append(indexed)
    val root = new Path(dir, "root")
    val last = corpus.currentSnapshot.get.snapshotId
    graft.ext.IncrementalDedup.writeStamp(spark, root, last, "fp0")

    corpus.append(vecs(100L until 106L))
    val head = corpus.currentSnapshot.get.snapshotId
    // scan-metric pin: the incremental slice the catch-up assigns lists
    // EXACTLY the files the batch commit added — none of the seed's
    // files are re-read (at 100 TB: O(batch) indexing, not O(corpus))
    def norm(p: String): String = new Path(p).toUri.getPath
    val batchFiles = corpus.files
      .filter(org.apache.spark.sql.functions.col("added_snapshot_id") === head)
      .select("path").collect().map(r => norm(r.getString(0))).toSet
    val sliceFiles = corpus.readIncremental(last, head)
      .inputFiles.map(norm).toSet
    assert(sliceFiles.nonEmpty && sliceFiles == batchFiles,
      s"slice=${sliceFiles.size}, batch=${batchFiles.size}")

    val n = graft.ext.IncrementalDedup.catchUp(corpus, index, root, "fp0", assign)
    assert(n == 6L)
    assert(index.read.count() == 38L)
    // caught up → a second catch-up indexes nothing
    assert(graft.ext.IncrementalDedup.catchUp(corpus, index, root, "fp0", assign) == 0L)
  }
}
