package graft.cmd

import java.time.Clock
import java.util.UUID

import org.apache.hadoop.fs.Path

import graft.meta.GraftTable

/** Small-file compaction: rewrite the current snapshot's data files into
  * `ceil(totalBytes / targetFileBytes)` files and commit the rewrite as a
  * new snapshot. Replaced files stay on storage, owned by older snapshots,
  * until `expireSnapshots` reclaims them.
  *
  * Reference analogue: `ALTER TABLE t EXECUTE optimize`
  * (trino_iceberg_maintenance/__main__.py:161-177); the observable
  * contract in the reference tests is file count 2 → 1
  * (tests/test_maintenance.py:51,67,78).
  *
  * Scale: the rewrite is one distributed read → round-robin repartition →
  * write; no data ever aggregates on the driver. At 100 TB this is the
  * same shape Iceberg's rewrite_data_files (binpack) action uses.
  */
object Optimize {
  /** @param clusterBy when non-empty, the rewrite range-partitions and
    *   sorts by these columns instead of round-robin bin-packing —
    *   sort-order compaction. Files come out value-clustered, so the
    *   manifest min/max bounds are tight and `readPruned` range scans
    *   skip most files (Iceberg's rewrite_data_files `sort` strategy
    *   vs. the default `binpack`). */
  def run(table: GraftTable, targetFileBytes: Long, clock: Clock,
          clusterBy: Seq[String] = Seq.empty): Unit =
    table.lock.synchronized {
      val current = table.currentSnapshot.getOrElse(return)
      if (current.numFiles <= 1 && clusterBy.isEmpty) return // already compact
      val nOut = math.max(1L,
        (current.totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val commitDir = new Path(table.dir, s"data/${UUID.randomUUID()}")
      val spec = table.partitionSpec
      val rewritten =
        if (clusterBy.nonEmpty)
          table.read
            .repartitionByRange(nOut, clusterBy.map(org.apache.spark.sql.functions.col): _*)
            .sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
        else if (spec.nonEmpty) {
          // keep a partitioned table clustered — a round-robin rewrite
          // would widen every file's transform bounds and kill pruning
          val df = table.read
          val exprs = spec.map(f => f.expr(df(f.column), df.schema(f.column).dataType))
          df.repartitionByRange(nOut, exprs: _*).sortWithinPartitions(exprs: _*)
        } else table.read.repartition(nOut)
      rewritten.write.parquet(commitDir.toString)
      table.fileSystem.delete(new Path(commitDir, "_SUCCESS"), false)
      table.doCommit("optimize", table.inventory(commitDir), clock)
    }
}
