package graft.cmd

import java.time.Clock

import org.apache.hadoop.fs.Path

import graft.meta.GraftTable

/** Delete files under the table's `data/` tree that no snapshot (of any
  * age) references and whose modification time is older than the
  * retention threshold — storage/metadata reconciliation after failed or
  * interrupted writes.
  *
  * Reference analogue:
  * `ALTER TABLE t EXECUTE remove_orphan_files(retention_threshold => 'Nd')`
  * (trino_iceberg_maintenance/__main__.py:141-148).
  *
  * The orphan set is `listing(data/) ∖ union(all manifests)` as a
  * left-anti join. The FS listing here is a recursive driver listing
  * parallelized into a DataFrame — on object storage at 100 TB this
  * would swap in a prefix-sharded distributed listing, while the join,
  * mtime filter, and fan-out deletion below are already distributed.
  *
  * @return number of orphan files deleted
  */
object RemoveOrphanFiles {
  def run(table: GraftTable, retentionDays: Int, clock: Clock): Long =
    table.lock.synchronized {
      val spark = table.spark
      val cutoffMs = clock.millis() - retentionDays.toLong * 86400000L
      val listed = GraftTable
        .listFiles(table.fileSystem, new Path(table.dir, "data"))
        .map(f => (GraftTable.normalize(f.getPath), f.getModificationTime))
      if (listed.isEmpty) return 0L
      import spark.implicits._
      val listing = spark.createDataset(listed).toDF("path", "mtime")

      val referenced = {
        // includes delete manifests — position-delete files live under
        // data/ and are referenced storage, not orphans
        val paths = table.snapshots
          .flatMap(s => s.manifests ++ s.deleteManifests ++ s.eqDeleteManifests)
          .distinct
        if (paths.isEmpty) table.emptyManifest
        else spark.read.schema(GraftTable.ManifestSchema).parquet(paths: _*)
      }.select("path")

      val orphans = listing
        .filter($"mtime" < cutoffMs)
        .join(referenced, Seq("path"), "left_anti")
        .select("path").as[String]

      // Ship the session's Hadoop conf to executors (credentials/endpoint
      // for non-default filesystems), instead of a from-scratch Configuration.
      val confB = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf()))
      val deleted = spark.sparkContext.longAccumulator("deletedOrphans")
      orphans.foreachPartition { (it: Iterator[String]) =>
        val conf = confB.value.value
        it.foreach { p =>
          val path = new Path(p)
          if (path.getFileSystem(conf).delete(path, false)) deleted.add(1L)
        }
      }
      deleted.value
    }
}
