package graft

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Content fingerprint of a source parquet file-or-directory, shared by
  * every build-once fixture in the repo (st11's stream-upsert fixture,
  * the maintenance demos' clone-per-run seeds). Recurses to the LEAF
  * files and folds each (relative path, length, mtime) into one digest
  * — never aggregated sums/maxes: a partitioned/nested source would
  * fingerprint as empty under a top-level-only listing, and an in-place
  * regeneration that preserves total bytes + file count + max mtime
  * would silently reuse a stale fixture. Callers prefix their own
  * recipe version so a code change also invalidates. */
object SourceFingerprint {
  def of(fs: FileSystem, src: Path): String = {
    val st = fs.getFileStatus(src)
    val leaves: Seq[FileStatus] = if (st.isFile) Seq(st) else {
      val it = fs.listFiles(src, true)
      val b = Seq.newBuilder[FileStatus]
      while (it.hasNext) b += it.next()
      b.result()
    }
    // qualify the base the same way listFiles qualifies its results
    // (scheme + authority): an unqualified caller path ("/x/y" vs
    // "file:/x/y") would make stripPrefix a no-op and embed ABSOLUTE
    // paths in the digest, forcing a spurious rebuild on any move
    val base = fs.makeQualified(src).toString
    // sorted by relative path: RemoteIterator order is fs-dependent
    val entries = leaves
      .map(f => (fs.makeQualified(f.getPath).toString.stripPrefix(base),
        f.getLen, f.getModificationTime))
      .sortBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.foreach { case (p, len, mt) =>
      md.update(s"$p|$len|$mt;".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }
    s"${entries.size}-${md.digest().map("%02x".format(_)).mkString}"
  }
}
