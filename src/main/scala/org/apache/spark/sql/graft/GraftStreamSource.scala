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
  * Options: `startingSnapshotId` — first batch starts AFTER this id
  * (default 0 = consume full history).
  */
final class GraftStreamSource(ctx: SQLContext, path: String,
                              startingSnapshotId: Long) extends Source {
  private val spark = ctx.sparkSession.asInstanceOf[SparkSession]
  private val table = GraftTable.load(spark, path)

  override val schema: StructType = table.schema

  /** The current table head; None until the first commit. */
  override def getOffset: Option[Offset] =
    table.snapshots.lastOption.map(s => LongOffset(s.snapshotId))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(toId).getOrElse(startingSnapshotId)
    val batch = table.readIncremental(from, toId(end))
    spark.internalCreateDataFrame(
      batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  // LongOffset's json is its number; restarts hand back SerializedOffset
  private def toId(o: Offset): Long = o.json.trim.toLong

  override def stop(): Unit = ()
}
