package graft.streaming

import java.time.Clock

import org.apache.spark.sql.DataFrame

import graft.meta.GraftTable

/** Structured-Streaming sink into a [[GraftTable]] with EXACTLY-ONCE
  * table semantics over Spark's at-least-once `foreachBatch` replay.
  *
  * Spark guarantees `foreachBatch` delivers every micro-batch with a
  * monotonically increasing `batchId`, but a batch can be REPLAYED after
  * a failure/restart (same id, same data). The sink makes the append
  * idempotent by stamping `(queryName, batchId)` into the snapshot
  * log's operation field — the stamp commits in the SAME atomic log
  * write as the data manifest, so there is no window where data landed
  * but the marker didn't (or vice versa). A replayed batch sees its id
  * already committed and becomes a no-op.
  *
  * This is the standard Iceberg/Delta streaming-sink commit protocol;
  * at 100 TB/day each micro-batch is one O(new files) delta-manifest
  * append, and the dedup check reads only the O(#snapshots) log.
  *
  * Usage:
  * {{{
  *   df.writeStream.foreachBatch(GraftSink.appendBatch(table, "q")).start()
  * }}}
  */
object GraftSink {
  private val OpPrefix = "stream_append"

  private def opFor(queryName: String, batchId: Long): String =
    s"$OpPrefix:q=$queryName:b=$batchId"

  /** Highest batch id this query has committed to the table, if any.
    * Scans the snapshot log only (no data or manifest I/O). */
  def lastBatch(table: GraftTable, queryName: String): Option[Long] = {
    val prefix = s"$OpPrefix:q=$queryName:b="
    val ids = table.snapshots.flatMap(s =>
      Option.when(s.operation.startsWith(prefix))(
        s.operation.stripPrefix(prefix).toLong))
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** `foreachBatch` function: append the micro-batch unless this
    * (query, batchId) already committed. With `branch` set, micro-
    * batches stage on that branch instead of main — streaming
    * write-audit-publish: validate `readBranch(branch)` downstream and
    * `fastForward("main", branch)` to publish a batch of batches. */
  def appendBatch(table: GraftTable, queryName: String,
                  clock: Clock = Clock.systemUTC(),
                  branch: String = "main")
                 (df: DataFrame, batchId: Long): Unit =
    table.lock.synchronized {
      if (!lastBatch(table, queryName).exists(_ >= batchId))
        table.appendOp(df, opFor(queryName, batchId), clock, branch)
    }
}
