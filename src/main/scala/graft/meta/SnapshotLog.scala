package graft.meta

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** One committed table version.
  *
  * The per-file inventory is NOT held here — it lives in parquet
  * manifests listed in [[manifests]], read as a DataFrame (scales to
  * millions of files; the log row stays O(#manifests)). Mirrors the
  * Iceberg snapshot-of-manifests model the reference operates on via
  * Trino (reference: trino_iceberg_maintenance/__main__.py:141-177
  * issues ALTER TABLE ... EXECUTE against exactly this structure).
  *
  * An APPEND commit writes only the delta manifest for its new files
  * and carries the prior snapshot's manifest list — commit metadata
  * cost is O(new files), not O(table), which is what keeps a
  * 100 TB/сommit-heavy table writable. Replacement commits (optimize /
  * overwrite / rewrite_manifests) start a fresh single-manifest list.
  * Manifests are therefore SHARED between snapshots; expiry must only
  * delete manifests no retained snapshot lists.
  *
  * @param timestampMs  commit time, epoch millis (driver clock — the
  *                     reference's two-clock split __main__.py:165 vs :174
  *                     is deliberately unified, SURVEY.md §7.7c)
  */
final case class Snapshot(
    snapshotId: Long,
    timestampMs: Long,
    operation: String, // append | optimize | overwrite | rewrite_manifests
    manifests: Seq[String],
    numFiles: Long,
    totalBytes: Long,
    totalRows: Long,
    parentId: Long = -1L) // commit this one was based on; -1 = none/unknown

/** The table's snapshot log: a small JSON array at
  * `<table>/_graft/snapshots.json`, committed by write-temp + atomic
  * rename (single-writer, same lock discipline as the reference's
  * module-level RLock, __main__.py:18).
  *
  * Hand-rolled JSON (fixed schema, no string escapes needed beyond
  * paths we generate ourselves) — keeps zero extra dependencies.
  */
object SnapshotLog {
  private val LogName = "snapshots.json"

  def logPath(tableDir: Path): Path = new Path(tableDir, s"_graft/$LogName")

  def read(fs: FileSystem, tableDir: Path): Seq[Snapshot] = {
    val p = logPath(tableDir)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      parse(txt)
    }
  }

  /** Overwrite the full log atomically (temp file + overwrite-rename).
    * FileContext.rename with Options.Rename.OVERWRITE replaces the target
    * in one FS operation — no delete-then-rename window where a crash
    * would leave NO snapshots.json and the table would read as absent.
    */
  def write(fs: FileSystem, tableDir: Path, snapshots: Seq[Snapshot]): Unit = {
    val p = logPath(tableDir)
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".$LogName.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(render(snapshots).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fc = FileContext.getFileContext(p.toUri, fs.getConf)
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  def current(snapshots: Seq[Snapshot]): Option[Snapshot] =
    if (snapshots.isEmpty) None else Some(snapshots.maxBy(_.snapshotId))

  // ---- tiny fixed-schema JSON codec -------------------------------------

  private def render(ss: Seq[Snapshot]): String =
    ss.map { s =>
      val ms = s.manifests.map(p => s""""$p"""").mkString("[", ",", "]")
      s"""{"snapshotId":${s.snapshotId},"parentId":${s.parentId},""" +
        s""""timestampMs":${s.timestampMs},""" +
        s""""operation":"${s.operation}","manifests":$ms,""" +
        s""""numFiles":${s.numFiles},"totalBytes":${s.totalBytes},"totalRows":${s.totalRows}}"""
    }.mkString("[\n", ",\n", "\n]")

  // parentId is optional on parse so pre-branching logs stay readable
  private val Entry =
    ("""\{"snapshotId":(-?\d+),(?:"parentId":(-?\d+),)?"timestampMs":(-?\d+),"operation":"([^"]*)",""" +
      """"manifests":\[([^\]]*)\],"numFiles":(\d+),"totalBytes":(\d+),"totalRows":(\d+)\}""").r

  private def parse(txt: String): Seq[Snapshot] =
    Entry.findAllMatchIn(txt).map { m =>
      val manifests =
        if (m.group(5).isEmpty) Seq.empty[String]
        else m.group(5).split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
      Snapshot(m.group(1).toLong, m.group(3).toLong, m.group(4),
        manifests, m.group(6).toLong, m.group(7).toLong, m.group(8).toLong,
        parentId = Option(m.group(2)).map(_.toLong).getOrElse(-1L))
    }.toSeq
}

/** Named branch refs: `_graft/refs.json`, a flat name → snapshotId map.
  * Absent file = only the implicit "main" at the max snapshot id (the
  * pre-branching behavior); the file is materialized by the first
  * branch operation. Written with the same atomic overwrite-rename as
  * the snapshot log. */
object Refs {
  private val Name = "refs.json"
  def path(tableDir: Path): Path = new Path(tableDir, s"_graft/$Name")
  private val Entry = """"([^"]+)":(-?\d+)""".r

  def read(fs: FileSystem, tableDir: Path): Map[String, Long] = {
    val p = path(tableDir)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      Entry.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toLong).toMap
    }
  }

  def write(fs: FileSystem, tableDir: Path, refs: Map[String, Long]): Unit = {
    val p = path(tableDir)
    fs.mkdirs(p.getParent)
    val txt = refs.toSeq.sortBy(_._1)
      .map { case (n, id) => s""""$n":$id""" }.mkString("{", ",", "}")
    val tmp = new Path(p.getParent, s".$Name.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(txt.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(p.toUri, fs.getConf)
      .rename(tmp, p, Options.Rename.OVERWRITE)
  }
}
