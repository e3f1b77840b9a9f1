package graft

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Content fingerprint of a source parquet file-or-directory, shared by
  * every build-once fixture in the repo (st11's stream-upsert fixture,
  * the maintenance demos' clone-per-run seeds). Hashes the LEAF files —
  * sum of lengths + max mtime + count — never the directory entry: a
  * directory's length is meaningless and its mtime only moves on child
  * create/delete, so an in-place regeneration that rewrites part-file
  * CONTENTS would otherwise reuse a stale fixture against fresh data.
  * Callers prefix their own recipe version so a code change also
  * invalidates. */
object SourceFingerprint {
  def of(fs: FileSystem, src: Path): String = {
    val st = fs.getFileStatus(src)
    val leaves: Seq[FileStatus] =
      if (st.isFile) Seq(st)
      else fs.listStatus(src).toSeq.filter(_.isFile)
    s"${leaves.map(_.getLen).sum}:" +
      s"${leaves.map(_.getModificationTime).maxOption.getOrElse(0L)}:" +
      s"${leaves.size}"
  }
}
