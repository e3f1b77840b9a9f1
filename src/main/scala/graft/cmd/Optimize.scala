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
  def run(table: GraftTable, targetFileBytes: Long, clock: Clock): Unit =
    table.lock.synchronized {
      val current = table.currentSnapshot.getOrElse(return)
      if (current.numFiles <= 1) return // already compact — commit nothing
      val nOut = math.max(1L,
        (current.totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val commitDir = new Path(table.dir, s"data/${UUID.randomUUID()}")
      table.read.repartition(nOut).write.parquet(commitDir.toString)
      table.fileSystem.delete(new Path(commitDir, "_SUCCESS"), false)
      table.doCommit("optimize", table.inventory(commitDir), clock)
    }
}
