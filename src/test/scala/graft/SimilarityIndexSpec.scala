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
}
