package graft.cmd

import java.time.Clock
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Copy-on-write row-level DELETE and MERGE (upsert) over the graft
  * table format — the `UPDATE ... WHERE` the reference issues against
  * its config table (trino_iceberg_maintenance/__main__.py:172-176,
  * 194-198) generalized to arbitrary data tables, with Iceberg
  * copy-on-write semantics.
  *
  * Plan shape (the same one Iceberg's Spark CoW uses):
  *   1. find AFFECTED files — the scan is pruned to files that contain
  *      at least one matching row (source file path exposed as a column,
  *      distributed);
  *   2. rewrite ONLY those files without their matched rows (+ the new
  *      rows for MERGE) into a fresh commit directory;
  *   3. commit a snapshot whose manifest = untouched files' rows
  *      (lineage preserved) + the rewrite's delta.
  *
  * Untouched files are never read or rewritten, so the cost scales with
  * the touched-file fraction, not table size — on a 100 TB table an
  * upsert landing in 0.1% of files reads and writes 0.1%.
  *
  * All reads go through the schema-aligned reader, so DELETE/MERGE work
  * unchanged on evolved tables (renamed/added/dropped columns).
  */
object RowLevel {
  private val FP = "__graft_fp"

  /** DELETE WHERE cond. SQL semantics: a row is deleted only where the
    * predicate is TRUE — rows where it evaluates NULL survive (a bare
    * `!cond` filter would silently drop them). Commits op `cow_delete`,
    * NOT `delete`: the MOR delete's op name would make the changelog
    * treat this replacement commit as row-level-tracked and emit the
    * rewritten survivors as spurious inserts. @return rows deleted. */
  def delete(table: GraftTable, cond: Column, clock: Clock): Long =
    table.lock.synchronized {
      val matched = coalesce(cond, lit(false))
      val before = table.currentSnapshot.map(_.totalRows).getOrElse(0L)
      rewrite(table, "cow_delete",
        affected = discover(table, matched),
        survivorsOf = df => df.filter(!matched),
        extra = None, clock)
      before - table.currentSnapshot.map(_.totalRows).getOrElse(0L)
    }

  /** Affected-file discovery for a predicate: the bounds/bloom-pruned
    * raw scan when available ([[GraftTable.affectedFilesRaw]] — on a
    * clustered table a selective predicate reads only candidate files),
    * else the aligned full scan. Raw discovery may over-mark files
    * whose matches are all MOR-deleted; those files are delete-targeted
    * and the rewrite unions [[GraftTable.deleteTargets]], so the final
    * affected set is identical either way. */
  private def discover(table: GraftTable, matched: Column): DataFrame =
    table.affectedFilesRaw(matched).getOrElse {
      table.morReadLive(table.liveFilePairs, Some(FP))
        .filter(matched).select(col(FP).as("path")).distinct()
    }

  /** UPDATE ... SET col = expr WHERE cond (Trino's general row-level
    * UPDATE): copy-on-write over ONLY the files containing matches —
    * each matched row has every SET column replaced by its expression
    * (evaluated against the OLD row, SQL semantics), survivors in the
    * same files are carried byte-equal. Commits op `update`, which the
    * changelog recovers as net delete+insert pairs. @return matched
    * rows. */
  def update(table: GraftTable, cond: Column, sets: Map[String, Column],
             clock: Clock): Long =
    table.lock.synchronized {
      require(sets.nonEmpty, "UPDATE requires at least one SET column")
      sets.keys.foreach(c => require(table.schema.fieldNames.contains(c),
        s"no such column $c"))
      val matched = coalesce(cond, lit(false))
      // discovery is pruned; the matched-row COUNT (MOR-applied, the
      // return value) then scans only the affected files — every file
      // holding a MOR-live matched row is raw-affected, so the pruned
      // count equals the full-scan count
      val spark = table.spark
      import spark.implicits._
      val affectedPaths = discover(table, matched).as[String].collect().toSet
      val hit = table.morReadLive(
        table.liveFilePairs.filter(p => affectedPaths(p._1))).filter(matched)
      val n = hit.count()
      if (n > 0) rewrite(table, "update",
        affected = spark.createDataset(affectedPaths.toSeq).toDF("path"),
        // withColumns applies all SETs against the OLD row at once —
        // `SET a = b, b = a` swaps, like SQL requires
        survivorsOf = df => df.withColumns(sets.map { case (c, e) =>
          c -> when(matched, e).otherwise(col(c))
        }),
        extra = None, clock)
      n
    }

  /** MERGE (upsert): rows in `source` replace table rows with the same
    * key; unmatched source rows are inserted. One commit. The
    * affected-file discovery scans only files whose manifest bounds
    * overlap the source keys' min/max ([[GraftTable.pairsOverlappingKeys]]):
    * a bounds-disjoint file cannot contain a matching row, so on a
    * clustered table an upsert landing in one key range reads the
    * overlapping files, not the table. */
  def merge(table: GraftTable, source: DataFrame, keys: Seq[String],
            clock: Clock): Unit =
    table.lock.synchronized {
      val srcKeys = source.select(keys.map(col): _*).distinct()
      val withPath = table.morReadLive(
        table.pairsOverlappingKeys(srcKeys, keys), Some(FP))
      rewrite(table, "merge",
        affected = withPath.join(srcKeys, keys, "left_semi")
          .select(col(FP).as("path")).distinct(),
        survivorsOf = df => df.join(srcKeys, keys, "left_anti"),
        extra = Some(source), clock)
    }

  /** Shared CoW machinery: rewrite the affected files via `survivorsOf`
    * (plus `extra` rows), keep every other file's manifest row as-is.
    * On a table with outstanding merge-on-read deletes, every
    * delete-targeted file is treated as affected too: the commit drops
    * the delete manifests (its logical row count is the physical
    * manifest sum), so any file still carrying delete entries must have
    * them materialized here — and untouched files are then guaranteed
    * delete-free. */
  private def rewrite(table: GraftTable, op: String, affected: DataFrame,
                      survivorsOf: DataFrame => DataFrame,
                      extra: Option[DataFrame], clock: Clock): Unit = {
    val spark = table.spark
    import spark.implicits._
    val basis = table.currentSnapshot
    val schema = table.schema
    val cols = schema.fieldNames.toSeq.map(col)
    val affectedPaths = affected.unionByName(table.deleteTargets)
      .as[String].collect().toSet
    // Re-used as a join input below — a tiny local relation, not a
    // re-execution of the affected-file scan.
    val affectedDf = spark.createDataset(affectedPaths.toSeq).toDF("path")

    val rewrittenRows = {
      val surv = survivorsOf(table.morReadLive(
        table.liveFilePairs.filter(p => affectedPaths(p._1))))
      extra.fold(surv.select(cols: _*))(e =>
        surv.select(cols: _*).unionByName(e.select(cols: _*)))
    }
    if (affectedPaths.isEmpty && extra.isEmpty) return // nothing matched

    val commitDir = new Path(table.dir, s"data/${UUID.randomUUID()}")
    // count the rewrite output on the write itself: an empty-source
    // MERGE touching no files must not land a junk empty commit
    val obs = new org.apache.spark.sql.Observation(
      s"cow-${commitDir.getName}")
    // Size the output like optimize's binpack: ceil(affected bytes /
    // target-file-size) files. Without this a small CoW rewrite emits
    // one fragment PER TASK (shuffle-partition count), shredding a
    // clustered file into overlapping slivers on every upsert — which
    // both accumulates manifest rows and defeats the next merge's
    // bounds pruning. coalesce never raises parallelism, so large
    // rewrites keep their scan tasks.
    val affectedBytes = table.files.select("path", "size_bytes").collect()
      .iterator.filter(r => affectedPaths(r.getString(0)))
      .map(_.getLong(1)).sum
    val outParts = math.max(1L, (affectedBytes +
      table.defaultTargetFileBytes - 1) / table.defaultTargetFileBytes).toInt
    table.dataWrite(rewrittenRows.observe(obs, count(lit(1)).as("n"))
        .coalesce(outParts))
      .parquet(commitDir.toString)
    table.fileSystem.delete(new Path(commitDir, "_SUCCESS"), false)
    if (affectedPaths.isEmpty &&
        obs.get.getOrElse("n", 0L).asInstanceOf[Long] == 0L) {
      table.fileSystem.delete(commitDir, true); return
    }
    // shuffle writes emit schema-only files for empty tasks — junk
    // manifest entries at one per rewrite
    table.pruneEmptyFiles(commitDir)

    val kept = table.files // manifest rows of files we did NOT touch
      .join(affectedDf, Seq("path"), "left_anti")
      .select((GraftTable.ManifestCols :+ "added_snapshot_id").map(col): _*)
    val delta = table.inventory(commitDir)
      .withColumn("added_snapshot_id", lit(null).cast("long")) // commit stamps
    table.doCommit(op, kept.unionByName(delta), clock, carryPrior = false,
      basis = basis)
  }
}
