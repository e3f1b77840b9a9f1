package graft

import java.nio.file.{Files, Paths}

/** The superseded-generation reaper (ADVICE r15): cold siblings of the
  * same tag+source key go, the live generation and anything younger
  * than the window stay, dangling lock files of reaped generations go
  * with them. */
class FixturesReaperSpec extends SparkSpec {

  private val tmp = System.getProperty("java.io.tmpdir")

  private def mkGen(name: String, ageMs: Long): java.io.File = {
    val d = Paths.get(tmp, name)
    Files.createDirectories(d.resolve("sub"))
    Files.writeString(d.resolve("sub").resolve("f"), "x")
    val t = System.currentTimeMillis() - ageMs
    Seq(d, d.resolve("sub"), d.resolve("sub").resolve("f"))
      .foreach(p => p.toFile.setLastModified(t))
    d.toFile
  }

  test("reaps cold superseded siblings, keeps the live generation") {
    val prefix = s"graft_reapspec_${System.nanoTime()}_"
    val keep = mkGen(s"${prefix}ffffffffffffffff", ageMs = 100L * 3600 * 1000)
    val staleOld = mkGen(s"${prefix}aaaaaaaaaaaaaaaa", 100L * 3600 * 1000)
    val staleFresh = mkGen(s"${prefix}bbbbbbbbbbbbbbbb", 0L)
    val staleLock = Paths.get(tmp, s"${prefix}cccccccccccccccc.lock")
    Files.writeString(staleLock, "")
    staleLock.toFile.setLastModified(
      System.currentTimeMillis() - 100L * 3600 * 1000)
    val keepLock = Paths.get(tmp, s"${keep.getName}.lock")
    Files.writeString(keepLock, "")
    try {
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(keep.exists(), "the live generation must survive")
      assert(keepLock.toFile.exists(), "the live generation's lock survives")
      assert(!staleOld.exists(), "a cold superseded sibling must be reaped")
      assert(staleFresh.exists(),
        "a sibling younger than the window must survive")
      assert(!staleLock.toFile.exists(),
        "a dangling lock of a reaped generation must go")
    } finally Seq(keep, staleFresh, keepLock.toFile, staleLock.toFile)
      .foreach(f => if (f.exists()) {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete(); ()
        }
        rm(f)
      })
  }

  test("a deep-but-recently-touched sibling survives (newest mtime wins)") {
    val prefix = s"graft_reapspec2_${System.nanoTime()}_"
    val keep = mkGen(s"${prefix}ffffffffffffffff", 0L)
    val sib = mkGen(s"${prefix}aaaaaaaaaaaaaaaa", 100L * 3600 * 1000)
    // one fresh leaf deep inside an otherwise old tree
    Files.writeString(sib.toPath.resolve("sub").resolve("fresh"), "y")
    try {
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(sib.exists(), "a tree with any fresh file must survive")
    } finally Seq(keep, sib).foreach { f =>
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(f)
    }
  }
}
