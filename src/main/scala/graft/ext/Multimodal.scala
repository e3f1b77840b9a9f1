package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.rel.Tables

/** Multimodal column plumbing: media payloads are opaque binary columns
  * with typed metadata; decode / feature-extraction runs per-partition
  * over a typed Dataset, so at cluster scale each executor decodes its
  * own splits with no shuffle before the feature aggregation.
  *
  * The actual byte decoder is a STUB — this container has no image/audio
  * codecs — implemented as a deterministic arithmetic fake over the
  * payload bytes. The Spark-side plumbing (binary schema, Encoders,
  * mapPartitions batch shape, downstream aggregation) is real and is what
  * the oracle checks.
  */
object Multimodal {
  /** An opaque media payload: bytes + source tag + MIME type. */
  case class MediaItem(doc_id: Long, source: String, mime: String,
      payload: Array[Byte])

  /** Features the (stubbed) decoder extracts per item. */
  case class MediaFeatures(doc_id: Long, source: String, mime: String,
      byte_len: Long, width: Long, height: Long, n_frames: Long)

  /** STUB decoder: stands in for an image/audio/video decode. Real
    * deployments swap this body for the codec call; everything around it
    * (schema, partitioning, batching) is unchanged. Deterministic in the
    * payload so tests and the SQL oracle can reproduce it. */
  def decodeStub(item: MediaItem): MediaFeatures = {
    val len = item.payload.length.toLong
    MediaFeatures(item.doc_id, item.source, item.mime,
      byte_len = len,
      width = len % 640,
      height = (len * 7) % 480,
      n_frames = len % 16 + 1)
  }

  /** Per-partition decode: the batch shape a real codec would want
    * (iterator-in, iterator-out; no per-row task overhead). */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(decodeStub))
  }

  /** documents.text re-cast as an opaque binary payload — the stand-in
    * media corpus for this container. */
  def mediaCorpus(s: SparkSession, dir: String): Dataset[MediaItem] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"source", lit("text/plain").as("mime"),
        $"text".cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** m01: decode features per item, aggregate per source. */
  def m01MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaCorpus(s, dir)).toDF()
      .groupBy($"source", $"mime")
      .agg(
        count(lit(1)).as("n_items"),
        sum($"byte_len").as("total_bytes"),
        round(avg($"width"), 6).as("avg_width"),
        round(avg($"height"), 6).as("avg_height"),
        sum($"n_frames").as("total_frames"))
      .orderBy($"source", $"mime")
  }

  /** m02: frame sampling — decode yields n_frames per item; emit every
    * 4th frame index (the shape of video keyframe extraction: explode
    * frames per item, keep a stride, hand each frame to a downstream
    * model). Pure narrow ops — generate/explode/filter, no shuffle
    * before the final aggregation. */
  def m02FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaCorpus(s, dir)).toDF()
      .select($"doc_id", $"source", $"n_frames",
        explode(sequence(lit(0L), $"n_frames" - 1)).as("frame_idx"))
      .filter($"frame_idx" % 4 === 0)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled_frames"),
        countDistinct($"doc_id").as("n_items"))
      .orderBy($"source")
  }

  /** m03: batched-inference plumbing — the GPU-model call shape. Items
    * group per source, each group is split into FIXED-SIZE batches
    * (sorted by doc_id, so batch membership is deterministic), and "the
    * model" (the decode stub) runs once per batch over the whole batch.
    * `groupByKey.flatMapGroups` is the KeyValueGroupedDataset form:
    * each group streams through one task, batches never cross
    * executors, and a real deployment swaps the stub for a batched
    * model invocation with zero plumbing changes. One shuffle (the
    * group key), like any per-source pass. */
  def m03BatchInference(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val batchSize = 32
    extractFeatures(mediaCorpus(s, dir))
      .groupByKey(_.source)
      .flatMapGroups { (src: String, items: Iterator[MediaFeatures]) =>
        items.toSeq.sortBy(_.doc_id).grouped(batchSize).zipWithIndex
          .map { case (batch, i) =>
            // one "model call" per batch: aggregate features batch-wide
            (src, i.toLong, batch.size.toLong, batch.map(_.byte_len).sum)
          }
      }
      .toDF("source", "batch_idx", "n_in_batch", "batch_bytes")
      .orderBy($"source", $"batch_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> (m01MediaFeatures _),
    "m02_frame_sample" -> (m02FrameSample _),
    "m03_batch_inference" -> (m03BatchInference _),
  )

  val oracles: Map[String, String] = Map(
    "m01_media_features" ->
      """WITH f AS (
        |  SELECT doc_id, source, 'text/plain' AS mime,
        |    octet_length(encode(text)) AS byte_len
        |  FROM documents)
        |SELECT source, mime, count(*) AS n_items,
        |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        |  round(avg(byte_len % 640), 6) AS avg_width,
        |  round(avg((byte_len * 7) % 480), 6) AS avg_height,
        |  CAST(sum(byte_len % 16 + 1) AS BIGINT) AS total_frames
        |FROM f GROUP BY source, mime ORDER BY source, mime""".stripMargin,
    "m03_batch_inference" ->
      """WITH f AS (
        |  SELECT source, doc_id, octet_length(encode(text)) AS byte_len,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(floor((rn - 1) / 32) AS BIGINT) AS batch_idx,
        |  count(*) AS n_in_batch, CAST(sum(byte_len) AS BIGINT) AS batch_bytes
        |FROM f GROUP BY source, batch_idx
        |ORDER BY source, batch_idx""".stripMargin,
    "m02_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    octet_length(encode(text)) % 16 + 1 AS n_frames
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, source, unnest(range(0, n_frames)) AS frame_idx
        |  FROM f)
        |SELECT source, count(*) AS n_sampled_frames,
        |  count(DISTINCT doc_id) AS n_items
        |FROM fr WHERE frame_idx % 4 = 0
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
