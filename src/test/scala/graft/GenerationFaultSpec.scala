package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.StreamOps

/** Fault injection for the persistent-generation machinery the
  * st-family and m09 rest on (VERDICT r15 item 3). Each test simulates
  * a specific crash the scaladocs claim to survive and pins the
  * recovery path:
  *   - a checkpoint that lost its last commit file (crash between the
  *     sink's marker-committed batch and the checkpoint commit) must
  *     REPLAY that batch as a marker no-op on the next call;
  *   - a superseded generation must stay readable while a regenerated
  *     source lands a fresh generation beside it;
  *   - an abandoned half-built m09 staging dir (crash before the
  *     atomic rename) must not poison a later rebuild.
  * All tests run against a PRIVATE copy of the testdata source so the
  * shared sf0.001 generations other suites (and a bench running
  * beside the suite) rely on are never disturbed. */
class GenerationFaultSpec extends SparkSpec {

  private def privateSource(withDocs: Boolean): String = {
    val d = tmpDir("genfault_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(d, "events.parquet"))
    if (withDocs)
      Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
        Paths.get(d, "documents.parquet"))
    d
  }

  private def generationDirs(tag: String, dir: String): Seq[java.io.File] = {
    val key = Fixtures.key8(dir)
    Option(new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        f.getName.startsWith(s"graft_${tag}_${key}_")).toSeq
  }

  private def rmRf(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
    f.delete(); ()
  }

  test("lost checkpoint commit: the replayed batch no-ops through the sink marker") {
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists())
    val src = privateSource(withDocs = false)
    try {
      val first = StreamOps.queries("st02_stream_dedup")(spark, src)
        .collect().map(_.toString).toSeq
      val gens = generationDirs("st02", src)
      assert(gens.size === 1, s"expected one fresh generation, got $gens")
      val gen = gens.head
      // crash injection: the sink committed batch N (marker + data in
      // one atomic log write) but the checkpoint's commit record for N
      // was never written — delete exactly that record
      val commits = new java.io.File(gen, "ckpt/commits")
        .listFiles().filter(_.getName.forall(_.isDigit))
      assert(commits.nonEmpty, "checkpoint must have commit records")
      val last = commits.maxBy(_.getName.toLong)
      val landedSnaps =
        graft.meta.GraftTable.load(spark, s"$gen/landed").snapshots.size
      assert(last.delete())
      // the local FS writes a checksum sidecar next to each commit
      // record; a crash loses both (they are renamed into place
      // together), so the injection removes both
      new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
      val again = StreamOps.queries("st02_stream_dedup")(spark, src)
        .collect().map(_.toString).toSeq
      assert(again === first, "post-recovery result must be identical")
      assert(graft.meta.GraftTable.load(spark, s"$gen/landed")
        .snapshots.size === landedSnaps,
        "the replayed batch must be a marker no-op — no new snapshot")
    } finally generationDirs("st02", src).foreach(rmRf)
  }

  test("superseded generation stays readable while a fresh one lands") {
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists())
    val src = privateSource(withDocs = false)
    try {
      val first = StreamOps.queries("st02_stream_dedup")(spark, src)
        .collect().map(_.toString).toSeq
      val oldGen = generationDirs("st02", src).head
      val oldLanded = graft.meta.GraftTable.load(spark, s"$oldGen/landed")
      val baseline = oldLanded.rowCount
      // the reader holds a live scan over the OLD generation
      val held = oldLanded.read
      // source regeneration: same bytes, new mtime → new fingerprint
      val ev = Paths.get(src, "events.parquet")
      Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"), ev,
        StandardCopyOption.REPLACE_EXISTING)
      ev.toFile.setLastModified(System.currentTimeMillis() + 10000)
      val again = StreamOps.queries("st02_stream_dedup")(spark, src)
        .collect().map(_.toString).toSeq
      assert(again === first)
      val gens = generationDirs("st02", src)
      assert(gens.size === 2,
        s"the superseded generation must LINGER (reaper is age-gated): $gens")
      assert(held.count() === baseline,
        "a scan planned over the superseded generation must still read it")
    } finally generationDirs("st02", src).foreach(rmRf)
  }

  test("abandoned half-built m09 staging dir does not poison a rebuild") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists())
    val src = privateSource(withDocs = true)
    try {
      val first = graft.ext.Multimodal.queries("m09_binary_ingest")(spark, src)
        .collect().map(_.toString).toSeq
      assert(first.nonEmpty)
      val gens = generationDirs("bin", src)
      assert(gens.size === 1)
      val root = gens.head
      // crash injection: a builder died BEFORE the atomic rename,
      // leaving a junk-filled build dir beside the publish name — and
      // the published generation itself is gone (say, reaped), so the
      // next call must rebuild from scratch with the corpse present
      val corpse = new java.io.File(s"$root.build.deadbeef")
      Files.createDirectories(corpse.toPath)
      Files.writeString(corpse.toPath.resolve("999999.bin"), "junk")
      rmRf(root)
      val again = graft.ext.Multimodal.queries("m09_binary_ingest")(spark, src)
        .collect().map(_.toString).toSeq
      assert(again === first,
        "rebuild beside an abandoned build dir must publish a clean set")
      assert(corpse.exists(),
        "the corpse is another (possibly live) builder's dir — left alone")
    } finally {
      generationDirs("bin", src).foreach(rmRf)
      val corpse = new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles().filter(_.getName.contains(".build.deadbeef"))
      corpse.foreach(rmRf)
    }
  }
}
