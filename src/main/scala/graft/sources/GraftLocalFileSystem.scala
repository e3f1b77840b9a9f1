package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file:` filesystem with a FORK-FREE setPermission.
  *
  * Without libhadoop.so (none ships with Spark), Hadoop's
  * `RawLocalFileSystem.setPermission` shells out (`exec chmod`) — and
  * every Spark write job calls it several times through
  * `FileOutputCommitter.setupJob`/`create` (_temporary dirs, task
  * files). On the maintenance demos that was ~25 forks per run, a
  * measurable slice of every commit's latency (JFR `jdk.ProcessStart`,
  * round 14). This subclass does the same chmod as ONE `java.nio`
  * syscall. Register with
  * `spark.hadoop.fs.file.impl = graft.sources.GraftLocalFileSystem`.
  * Everything else (checksums, rename, listing) is inherited unchanged.
  */
final class GraftLocalFileSystem
  extends LocalFileSystem(new GraftRawLocalFileSystem)

final class GraftRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    // beyond rwxrwxrwx (sticky/setuid) NIO posix perms can't express —
    // fall back to Hadoop's shell path for those rare cases
    if ((bits & ~0x1ff) != 0) { super.setPermission(p, permission); return }
    val mapping = Seq(
      0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
      0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
      0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)
    val perms = new java.util.HashSet[PosixFilePermission]()
    mapping.foreach { case (bit, perm) =>
      if ((bits & bit) != 0) perms.add(perm)
    }
    java.nio.file.Files.setPosixFilePermissions(
      java.nio.file.Paths.get(makeQualified(p).toUri.getPath), perms)
  }
}
