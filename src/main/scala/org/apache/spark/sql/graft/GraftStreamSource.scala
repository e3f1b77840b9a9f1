package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.meta.GraftTable

/** A graft table as a STREAMING SOURCE: snapshot ids are the stream
  * offsets, and each micro-batch is `readIncremental(lastSeen, head]` —
  * planned metadata-only from the manifest's `added_snapshot_id`, so a
  * consumer of a 100 TB table reads exactly the files new appends wrote
  * and nothing else. Combined with checkpointing this gives Delta-style
  * exactly-once incremental consumption of a table other jobs append to
  * (reference analogue: none — the north star's streaming extension).
  *
  * Semantics match the incremental scan: ranges must be append-only. A
  * replacement commit (optimize/overwrite/row-level CoW) inside an
  * unconsumed range fails the stream loudly rather than re-delivering
  * rewritten rows — schedule maintenance at checkpoints, exactly like
  * Delta without ignoreChanges.
  *
  * This class lives under `org.apache.spark.sql` because a DSv1
  * [[Source]]'s `getBatch` must return a DataFrame with
  * `isStreaming = true`, and the only way to mint one is the
  * `private[sql]` `SparkSession.internalCreateDataFrame` — the same
  * call Spark's own FileStreamSource makes (this is the established
  * pre-DSv2 connector pattern).
  *
  * Options:
  *   - `startingSnapshotId` — first batch starts AFTER this id
  *     (default 0 = consume full history).
  *   - `readChangeFeed` — stream the row-level CHANGELOG instead of
  *     the raw appends (Delta CDF shape): each micro-batch is
  *     `readChanges(lastSeen, head]`, rows stamped with `_change_type`
  *     ('insert' | 'delete') and `_commit_snapshot_id`. Merge-on-read
  *     delete and upsert commits stream as their exact change events —
  *     the consumption path for tables written by the CDC upsert sink.
  *   - `maxSnapshotsPerTrigger` / `maxFilesPerTrigger` — admission
  *     control (Delta's maxFilesPerTrigger shape): cap how many
  *     snapshots / how many data FILES a single micro-batch may cover,
  *     so a consumer starting against a month of backlog drains it in
  *     bounded, checkpointed batches instead of one giant catch-up job.
  *     The file cap is computed metadata-only from the log's cumulative
  *     `numFiles` (appends only grow it); a single snapshot larger than
  *     the cap still ships whole — a batch boundary cannot split a
  *     snapshot (offsets are snapshot ids). After a restart the engine
  *     re-hands the source its last batch via `getBatch`, which re-primes
  *     the pacing base, so limits hold across checkpoint resumes.
  */
final class GraftStreamSource(ctx: SQLContext, path: String,
                              startingSnapshotId: Long,
                              maxSnapshotsPerTrigger: Option[Long] = None,
                              maxFilesPerTrigger: Option[Long] = None,
                              changeFeed: Boolean = false)
  extends Source {
  private val spark = ctx.sparkSession.asInstanceOf[SparkSession]
  private val table = GraftTable.load(spark, path)

  override val schema: StructType = GraftStreamSource.schemaFor(table, changeFeed)

  /** Highest snapshot id already handed out as a batch end (or restored
    * from the checkpoint via getBatch on restart) — the base the next
    * trigger's admission window opens from. */
  @volatile private var pacingBase: Long = -1L

  /** The next batch's end offset: the table head, clamped by the
    * per-trigger admission caps. */
  override def getOffset: Option[Offset] = {
    val snaps = table.snapshots
    if (snaps.isEmpty) return None
    val head = snaps.last.snapshotId
    val base = if (pacingBase >= 0) pacingBase else startingSnapshotId
    if (head <= base ||
        (maxSnapshotsPerTrigger.isEmpty && maxFilesPerTrigger.isEmpty)) {
      pacingBase = math.max(pacingBase, head)
      return Some(LongOffset(head))
    }
    val pending = snaps.filter(s => s.snapshotId > base).sortBy(_.snapshotId)
    var end = head
    maxSnapshotsPerTrigger.foreach { m =>
      // clamp BEFORE toInt: a cap above Int.MaxValue would overflow
      // negative and make take() return an empty list
      val n = math.min(math.max(1L, m), pending.length.toLong).toInt
      end = math.min(end, pending.take(n).last.snapshotId)
    }
    maxFilesPerTrigger.foreach { m =>
      // cumulative numFiles → per-snapshot file deltas, no I/O
      var prevFiles = snaps.filter(_.snapshotId <= base)
        .lastOption.map(_.numFiles).getOrElse(0L)
      var budget = m
      var chosen = -1L
      val it = pending.iterator
      var done = false
      while (it.hasNext && !done) {
        val s = it.next()
        val delta = math.max(0L, s.numFiles - prevFiles)
        prevFiles = s.numFiles
        if (chosen < 0 || delta <= budget) { // always admit >= 1 snapshot
          chosen = s.snapshotId
          budget -= delta
          if (budget <= 0) done = true
        } else done = true
      }
      end = math.min(end, chosen)
    }
    pacingBase = math.max(pacingBase, end)
    Some(LongOffset(end))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(toId).getOrElse(startingSnapshotId)
    pacingBase = math.max(pacingBase, toId(end))
    val batch =
      if (changeFeed) table.readChanges(from, toId(end))
      else table.readIncremental(from, toId(end))
    spark.internalCreateDataFrame(
      batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  // LongOffset's json is its number; restarts hand back SerializedOffset
  private def toId(o: Offset): Long = o.json.trim.toLong

  override def stop(): Unit = ()
}

object GraftStreamSource {
  def schemaFor(table: GraftTable, changeFeed: Boolean): StructType =
    if (!changeFeed) table.schema
    else StructType(table.schema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType, nullable = false))
}
