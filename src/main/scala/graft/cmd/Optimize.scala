package graft.cmd

import java.time.Clock
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, lit}

import graft.meta.GraftTable

/** File-size compaction, Iceberg `rewrite_data_files` (binpack) shape:
  * SELECT the mis-sized files from the manifest — undersized ones to
  * merge AND oversized ones to split — bin-pack and rewrite just those,
  * and carry every already-compact file through the commit untouched
  * (same path, same `added_snapshot_id` lineage). Replaced files stay
  * on storage, owned by older snapshots, until `expireSnapshots`
  * reclaims them.
  *
  * Reference analogue: `ALTER TABLE t EXECUTE optimize`
  * (trino_iceberg_maintenance/__main__.py:170); the observable contract
  * in the reference tests is file count 2 → 1
  * (tests/test_maintenance.py:51,67,78) — tiny test files are all below
  * the threshold, so the full-compaction behavior is unchanged there.
  *
  * Scale: this is what makes `optimize` a maintenance op instead of a
  * table copy — a 100 TB table with 1% small files rewrites ~1 TB, not
  * 100 TB. File selection is a distributed filter over the manifest;
  * only the (small) candidate path list ever reaches the driver, and
  * the untouched majority of the manifest flows into the new commit as
  * a DataFrame without being collected.
  */
object Optimize {
  /** Files below this fraction of the target size are compaction
    * candidates (Iceberg's MIN_FILE_SIZE_DEFAULT_RATIO). */
  private val MinFileSizeRatio = 0.75
  /** Files above this fraction of the target are SPLIT candidates
    * (Iceberg's MAX_FILE_SIZE_DEFAULT_RATIO) — binpack rewrites
    * oversized files into ~size/target pieces, not only small ones. */
  private val MaxFileSizeRatio = 1.8
  /** Fewer small candidates than this → nothing worth compacting
    * (a single oversized file is always worth splitting). */
  private val MinInputFiles = 2

  /** Partition-scoped binpack: like [[run]], but only files inside the
    * partition scope are candidates; everything else is carried
    * untouched with its lineage. See
    * [[graft.meta.GraftTable.optimizePartitions]] for semantics. */
  def runScoped(table: GraftTable, preds: Seq[(String, org.apache.spark.sql.Column)],
                targetFileBytes: Long, clock: Clock): Unit =
    table.lock.synchronized {
      val current = table.currentSnapshot.getOrElse(return)
      require(current.deleteManifests.isEmpty &&
        current.eqDeleteManifests.isEmpty,
        "scoped optimize on a table with outstanding merge-on-read " +
          "deletes would drop delete entries for out-of-scope files; " +
          "run optimize() or rewriteDeleteFiles() first")
      val spec = table.partitionSpec
      val minBytes = (targetFileBytes * MinFileSizeRatio).toLong
      val maxBytes = (targetFileBytes * MaxFileSizeRatio).toLong
      val manifest = table.files
      val candidate = table.partitionScope(preds) &&
        (col("size_bytes") < minBytes || col("size_bytes") > maxBytes)
      val candRows = manifest.filter(candidate)
        .select("path", "added_snapshot_id", "size_bytes").collect()
      val numSmall = candRows.count(_.getLong(2) < minBytes)
      if (numSmall < MinInputFiles && candRows.length == numSmall) return
      val candPairs = candRows.map(r =>
        (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1))).toIndexedSeq
      val candBytes = candRows.map(_.getLong(2)).sum
      val nOut = math.max(1L,
        (candBytes + targetFileBytes - 1) / targetFileBytes).toInt
      val commitDir = new Path(table.dir, s"data/${UUID.randomUUID()}")
      val toRewrite = table.readFilesAligned(candPairs)
      val exprs = spec.map(f =>
        f.expr(toRewrite(f.column), toRewrite.schema(f.column).dataType)) ++
        table.sortExprs(toRewrite)
      val rewritten =
        if (exprs.nonEmpty)
          toRewrite.repartitionByRange(nOut, exprs: _*)
            .sortWithinPartitions(exprs: _*)
        else toRewrite.repartition(nOut)
      table.dataWrite(rewritten).parquet(commitDir.toString)
      table.fileSystem.delete(new Path(commitDir, "_SUCCESS"), false)
      if (exprs.nonEmpty) table.pruneEmptyFiles(commitDir)
      val untouched = manifest.filter(!candidate)
        .select((GraftTable.ManifestCols :+ "added_snapshot_id").map(col): _*)
      val fresh = table.inventory(commitDir)
        .withColumn("added_snapshot_id", lit(null).cast("long"))
      table.doCommit("optimize", untouched.unionByName(fresh), clock,
        basis = Some(current))
    }

  /** @param clusterBy when non-empty, the rewrite range-partitions and
    *   sorts by these columns instead of bin-packing — sort-order
    *   compaction (Iceberg's rewrite_data_files `sort` strategy). Sort
    *   compaction re-clusters the WHOLE table by definition, so file
    *   selection does not apply there. */
  def run(table: GraftTable, targetFileBytes: Long, clock: Clock,
          clusterBy: Seq[String] = Seq.empty): Unit =
    table.lock.synchronized {
      val current = table.currentSnapshot.getOrElse(return)
      val hasDeletes =
        current.deleteManifests.nonEmpty || current.eqDeleteManifests.nonEmpty
      if (current.numFiles <= 1 && clusterBy.isEmpty && !hasDeletes)
        return // already compact
      val spec = table.partitionSpec
      val commitDir = new Path(table.dir, s"data/${UUID.randomUUID()}")

      if (clusterBy.nonEmpty) {
        // sort-order compaction: full re-cluster, replaces every file
        val nOut = math.max(1L,
          (current.totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
        table.dataWrite(table.read
          .repartitionByRange(nOut, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*))
          .parquet(commitDir.toString)
        table.fileSystem.delete(new Path(commitDir, "_SUCCESS"), false)
        table.pruneEmptyFiles(commitDir)
        table.doCommit("optimize", table.inventory(commitDir), clock,
          basis = Some(current))
        return
      }

      // ---- binpack: rewrite undersized, oversized, AND delete-laden files
      val minBytes = (targetFileBytes * MinFileSizeRatio).toLong
      val maxBytes = (targetFileBytes * MaxFileSizeRatio).toLong
      // Files targeted by outstanding MOR delete entries are rewritten
      // too (with the deletes applied) — the commit drops the delete
      // manifests, so every entry must be materialized here (Iceberg's
      // rewrite_position_delete_files folded into binpack). Tables
      // without deletes skip the target join entirely.
      val manifest =
        if (!hasDeletes)
          table.files.withColumn("has_deletes", lit(null).cast("boolean"))
        else table.files.join(
          table.deleteTargets.withColumn("has_deletes", lit(true)),
          Seq("path"), "left")
      val candidate = col("size_bytes") < minBytes ||
        col("size_bytes") > maxBytes || col("has_deletes").isNotNull
      val candRows = manifest.filter(candidate)
        .select("path", "added_snapshot_id", "size_bytes", "has_deletes")
        .collect()
      val numSmall = candRows.count(r => r.getLong(2) < minBytes)
      val numForced = candRows.count(r =>
        !r.isNullAt(3) || r.getLong(2) > maxBytes)
      // lone small files aren't worth a rewrite; any oversized or
      // delete-laden file always is
      if (numSmall < MinInputFiles && numForced == 0) return
      val candPairs = candRows.map(r =>
        (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1))).toIndexedSeq
      val candBytes = candRows.map(_.getLong(2)).sum
      val nOut = math.max(1L,
        (candBytes + targetFileBytes - 1) / targetFileBytes).toInt

      val toRewrite = table.morReadLive(candPairs)
      // keep partitioned/sorted tables clustered — a round-robin rewrite
      // would widen every file's transform/sort bounds and kill pruning
      val exprs = spec.map(f =>
        f.expr(toRewrite(f.column), toRewrite.schema(f.column).dataType)) ++
        table.sortExprs(toRewrite)
      val rewritten =
        if (exprs.nonEmpty)
          toRewrite.repartitionByRange(nOut, exprs: _*)
            .sortWithinPartitions(exprs: _*)
        else toRewrite.repartition(nOut)
      table.dataWrite(rewritten).parquet(commitDir.toString)
      table.fileSystem.delete(new Path(commitDir, "_SUCCESS"), false)
      if (exprs.nonEmpty) table.pruneEmptyFiles(commitDir)

      // New manifest = untouched entries (original lineage preserved, never
      // collected) ∪ the freshly written files (stamped with the new id by
      // the commit's coalesce on added_snapshot_id).
      val untouched = manifest.filter(!candidate)
        .select((GraftTable.ManifestCols :+ "added_snapshot_id").map(col): _*)
      val fresh = table.inventory(commitDir)
        .withColumn("added_snapshot_id", lit(null).cast("long"))
      table.doCommit("optimize", untouched.unionByName(fresh), clock,
        basis = Some(current))
    }
}
