package graft.meta

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic publish-rename for the JSON metadata files (snapshot-log CAS
  * versions, properties, schemas, partition specs).
  *
  * On a LOCAL filesystem this goes through `java.nio.file.Files.move`
  * (one `rename(2)` syscall). Hadoop's `FileContext.rename` on `file:`
  * FORKS A CHILD PROCESS per call (`AbstractFileSystem.renameInternal` →
  * `getFileLinkStatus` → `FileUtil.readLink` → `exec readlink`) — ~850
  * forks per bench demo pass, the dominant driver-side gap in every
  * maintenance entry's commit chain (JFR `jdk.ProcessStart`, round 14).
  * Semantics are unchanged: Hadoop's local no-overwrite rename is
  * check-then-rename ("atomic on HDFS; CHECKED on local FS"), exactly
  * what the NIO path does. Non-local schemes keep the FileContext call
  * and its real atomicity.
  *
  * ChecksumFileSystem sidecars: `fs.create(tmp)` on a local fs also
  * writes `.<tmp>.crc`; the sidecar must move WITH the file (a stale
  * dst crc fails every subsequent read). The dst crc is deleted BEFORE
  * the data rename so no reader ever pairs new data with an old crc —
  * a reader in the gap sees data without a crc, which ChecksumFileSystem
  * reads unverified. */
private[meta] object AtomicRename {
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def local(fs: FileSystem, p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)

  private def crcOf(p: java.nio.file.Path): java.nio.file.Path =
    p.getParent.resolve("." + p.getFileName.toString + ".crc")

  private def moveLocal(fs: FileSystem, src: Path, dst: Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val (s, d) = (local(fs, src), local(fs, dst))
    Files.deleteIfExists(crcOf(d))
    Files.move(s, d, StandardCopyOption.ATOMIC_MOVE)
    // The data file is PUBLISHED past this point: a sidecar failure
    // must NOT propagate — the snapshot-log CAS catches IOException as
    // "lost the race", so surfacing one here would misreport a LANDED
    // commit as lost and the caller would re-apply it on the next
    // version (a double-commit). Degrade instead: drop the stale src
    // sidecar best-effort; a crc-less dst reads unverified, which is
    // the documented gap state above.
    try {
      if (Files.exists(crcOf(s)))
        Files.move(crcOf(s), crcOf(d), StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case e: java.io.IOException =>
        // degrade is intentional, but never SILENT: a checksum gap must
        // be observable after the fact (and a src-named .crc left by a
        // failed cleanup would otherwise be indistinguishable from one
        // a concurrent writer is still using)
        log.warn(s"crc sidecar move failed for $d — " +
          "dst reads unverified until rewritten", e)
        try Files.deleteIfExists(crcOf(s))
        catch {
          case e2: java.io.IOException =>
            log.warn(s"stale src crc sidecar ${crcOf(s)} could not be " +
              "removed", e2)
        }
    }
  }

  /** Overwrite-publish `src` onto `dst` (properties/schema/spec heads). */
  def overwrite(fs: FileSystem, src: Path, dst: Path): Unit =
    if (fs.getScheme == "file") moveLocal(fs, src, dst)
    else
      org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, fs.getConf)
        .rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)

  /** Claim-rename: an existing `dst` FAILS the rename (the snapshot-log
    * CAS). Throws `FileAlreadyExistsException`/`IOException` on a lost
    * race, like the FileContext spelling it replaces. */
  def claim(fs: FileSystem, src: Path, dst: Path): Unit =
    if (fs.getScheme == "file") {
      if (java.nio.file.Files.exists(local(fs, dst)))
        throw new java.nio.file.FileAlreadyExistsException(dst.toString)
      moveLocal(fs, src, dst)
    } else
      org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, fs.getConf)
        .rename(src, dst)
}
