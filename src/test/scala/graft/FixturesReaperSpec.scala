package graft

import java.nio.file.{Files, Paths}

/** The superseded-generation reaper (ADVICE r15): two-phase — the
  * first sighting of a superseded sibling only STAMPS it (starting the
  * clock at observation, so a reader that planned against it moments
  * before supersession gets the full window), and a later call reaps
  * it once everything inside has been cold for the window. The live
  * generation and anything recently touched stay; dangling lock files
  * of reaped generations go. */
class FixturesReaperSpec extends SparkSpec {

  private val tmp = System.getProperty("java.io.tmpdir")

  private def mkGen(name: String, ageMs: Long): java.io.File = {
    val d = Paths.get(tmp, name)
    Files.createDirectories(d.resolve("sub"))
    Files.writeString(d.resolve("sub").resolve("f"), "x")
    age(d.toFile, ageMs)
    d.toFile
  }

  private def age(f: java.io.File, ageMs: Long): Unit = {
    val t = System.currentTimeMillis() - ageMs
    def walk(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(walk)
      x.setLastModified(t); ()
    }
    walk(f)
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(); ()
  }

  test("two-phase reap: stamp on first sighting, delete once cold") {
    val prefix = s"graft_reapspec_${System.nanoTime()}_"
    val keep = mkGen(s"${prefix}ffffffffffffffff", ageMs = 100L * 3600 * 1000)
    val stale = mkGen(s"${prefix}aaaaaaaaaaaaaaaa", 100L * 3600 * 1000)
    val staleLock = Paths.get(tmp, s"${prefix}cccccccccccccccc.lock")
    Files.writeString(staleLock, "")
    staleLock.toFile.setLastModified(
      System.currentTimeMillis() - 100L * 3600 * 1000)
    val keepLock = Paths.get(tmp, s"${keep.getName}.lock")
    Files.writeString(keepLock, "")
    try {
      // phase 1: the old-but-just-superseded sibling is only STAMPED —
      // an in-flight reader of it must get the full window
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(stale.exists(),
        "first sighting must stamp, not delete — readers get the window")
      assert(new java.io.File(stale, ".graft_superseded").exists())
      assert(!staleLock.toFile.exists(),
        "a dangling lock of a long-gone generation goes immediately " +
          "once cold (no reader can hold a lock FILE)")
      // phase 2, too soon: the marker is fresh — still survives
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(stale.exists(), "a fresh marker must hold the window open")
      // phase 2, cold: age everything (marker included) past the window
      age(stale, 100L * 3600 * 1000)
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(!stale.exists(), "a cold stamped sibling must be reaped")
      assert(keep.exists() && keepLock.toFile.exists(),
        "the live generation and its lock always survive")
    } finally Seq(keep, stale, keepLock.toFile, staleLock.toFile)
      .foreach(f => if (f.exists()) rm(f))
  }

  test("a stamped sibling with any fresh file survives (newest mtime wins)") {
    val prefix = s"graft_reapspec2_${System.nanoTime()}_"
    val keep = mkGen(s"${prefix}ffffffffffffffff", 0L)
    val sib = mkGen(s"${prefix}aaaaaaaaaaaaaaaa", 100L * 3600 * 1000)
    try {
      Fixtures.reapStaleSiblings(keep.getName, prefix) // stamps
      age(sib, 100L * 3600 * 1000)                     // cold marker...
      // ...but one fresh leaf deep inside the tree
      Files.writeString(sib.toPath.resolve("sub").resolve("fresh"), "y")
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(sib.exists(), "a tree with any fresh file must survive")
    } finally Seq(keep, sib).foreach(rm)
  }

  test("a touchRead reader stamp holds the window open (observed liveness)") {
    val prefix = s"graft_reapspec4_${System.nanoTime()}_"
    val keep = mkGen(s"${prefix}ffffffffffffffff", 0L)
    val sib = mkGen(s"${prefix}aaaaaaaaaaaaaaaa", 100L * 3600 * 1000)
    try {
      Fixtures.reapStaleSiblings(keep.getName, prefix) // stamps
      age(sib, 100L * 3600 * 1000)                     // fully cold...
      // ...but a reader OPENED it just now (ADVICE r16: liveness is
      // observed via the stamp, not inferred from build mtimes)
      Fixtures.touchRead(sib)
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(sib.exists(), "a just-read generation must survive the reap")
      assert(new java.io.File(sib, ".graft_lastread").exists())
      age(sib, 100L * 3600 * 1000) // reader gone for a full window
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(!sib.exists(), "once the READER has been cold a window, reap")
      // touchRead on a vanished dir is a no-op, never a throw
      Fixtures.touchRead(sib)
    } finally Seq(keep, sib).foreach(f => if (f.exists()) rm(f))
  }

  test("a wrong stamp on the live generation self-heals; .build dirs never stamp") {
    val prefix = s"graft_reapspec3_${System.nanoTime()}_"
    val keep = mkGen(s"${prefix}ffffffffffffffff", 100L * 3600 * 1000)
    val build = mkGen(s"${prefix}aaaaaaaaaaaaaaaa.build.deadbeef",
      100L * 3600 * 1000)
    // a stale-fingerprint racer stamped the CURRENT generation
    Files.writeString(keep.toPath.resolve(".graft_superseded"), "")
    try {
      Fixtures.reapStaleSiblings(keep.getName, prefix)
      assert(!new java.io.File(keep, ".graft_superseded").exists(),
        "the live generation's reap must clear a racer's wrong stamp")
      assert(build.exists() &&
        !new java.io.File(build, ".graft_superseded").exists(),
        "a live builder's .build.* dir is never stamped or touched")
    } finally Seq(keep, build).foreach(rm)
  }

  test("legacy hashCode-keyed fixture names reap once cold") {
    val d1 = mkGen("graft_pruned_g12345678", 100L * 3600 * 1000)
    val d2 = mkGen("graft_xseed_x12_987654321_v9-static", 100L * 3600 * 1000)
    val fresh = mkGen("graft_bloom_g999", 0L)
    // a key8-named dir must NEVER match the legacy pattern, even when
    // the 16 hex chars happen to be all decimal digits
    val hexy = mkGen("graft_pruned_g1234567890123456", 100L * 3600 * 1000)
    try {
      Fixtures.reapLegacyNames()
      assert(!d1.exists() && !d2.exists(), "cold legacy dirs must go")
      assert(fresh.exists(), "age gate applies to legacy names too")
      assert(hexy.exists(), "16-char keys are key8-era — never legacy")
    } finally Seq(d1, d2, fresh, hexy).foreach(f => if (f.exists()) rm(f))
  }
}
