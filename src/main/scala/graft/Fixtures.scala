package graft

/** Shared machinery for fingerprint-keyed /tmp fixture GENERATIONS
  * (the m09 blob store, the landed-stream tables, clonedSeed's kin):
  * one place for the 8-hex dir key and the cross-process build lock,
  * so a future fix to either lands everywhere at once. */
private[graft] object Fixtures {
  /** 8-byte (16 hex char) MD5 prefix — the generation-dir key
    * component. MD5 of the value, not String.hashCode: two sources
    * with colliding hashCodes must not thrash each other's
    * generation. */
  def key8(v: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

  // one JVM lock per lock-file name: two threads of one JVM locking the
  // same file would throw OverlappingFileLockException
  private val jvmLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** How long a superseded generation must remain unclaimed AFTER its
    * supersession is first OBSERVED (the [[SupersededMarker]] stamp)
    * before [[reapStaleSiblings]] reclaims it. The clock starts at
    * observation, not at the generation's build time, so an in-flight
    * reader that planned against the old generation moments before the
    * new one landed always gets the full window — readers never bump
    * mtimes, so age-since-build alone could delete a generation that
    * was serving reads a second earlier. */
  val ReapAgeMs: Long = 6L * 3600 * 1000

  private val SupersededMarker = ".graft_superseded"

  private val LastReadStamp = ".graft_lastread"

  /** Reader-liveness stamp (ADVICE r16): readers take no lock, so the
    * reaper's age window used to be INFERRED from build-time mtimes — a
    * reader idle longer than [[ReapAgeMs]] (paused bench, debugger)
    * could have the generation it planned against deleted mid-session.
    * Touching a dot-file on every read-resolve makes liveness OBSERVED:
    * [[reapStaleSiblings]]'s phase-2 `newest` walk sees the stamp, so a
    * generation is only reclaimed once a full window has passed since
    * the last OPEN (dot-files are invisible to Spark's file listing and
    * to [[graft.meta.GraftTable.listFiles]], so the stamp never changes
    * what a scan reads). Best-effort: a read-only or vanished dir must
    * never fail the read itself. */
  def touchRead(dir: java.io.File): Unit =
    try {
      if (dir.isDirectory) {
        val f = new java.io.File(dir, LastReadStamp)
        if (!f.createNewFile()) { f.setLastModified(System.currentTimeMillis()); () }
      }
    } catch { case _: Exception => () }

  /** Opportunistic two-phase reaper for superseded fingerprint-keyed
    * generations (ADVICE r15): tmpdir siblings named `prefix*` OTHER
    * than `keepName` — same tag + source-dir key, different source
    * fingerprint. First sighting stamps a [[SupersededMarker]] into the
    * sibling and leaves it; a later call deletes it once EVERYTHING in
    * it (marker included) has been cold for `ageMs` — bounding tmpdir
    * growth on long-lived boxes to the live generation (plus at most
    * one reap-window of lag) per (tag, source). Call while holding the
    * CURRENT generation's file lock: old-fingerprint generations can
    * gain no new writer (the fingerprint derives from source mtimes,
    * which never revert), so marker age certifies them dead. A
    * sibling's `.lock` file goes only once its directory is gone. */
  def reapStaleSiblings(keepName: String, prefix: String,
                        ageMs: Long = ReapAgeMs): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val now = System.currentTimeMillis()
    // self-heal a WRONG stamp on the live generation: a racer still
    // holding the OLD fingerprint's lock sees the new generation as a
    // "sibling" and phase-1-stamps it; left in place, that marker would
    // let the next reap delete a just-superseded generation with no
    // window. The current generation's own reap clears it.
    rmRf(new java.io.File(new java.io.File(tmp, keepName), SupersededMarker))
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (n.startsWith(prefix) && n != keepName && n != s"$keepName.lock" &&
          // a .build.* dir is a LIVE builder's workspace (m09's atomic
          // staging), never a superseded generation — stamping it would
          // bake a marker into the published dir
          !n.contains(".build.")) {
        if (f.isDirectory) {
          val marker = new java.io.File(f, SupersededMarker)
          if (!marker.exists())
            // phase 1: observed superseded — start its clock
            (try marker.createNewFile() catch { case _: Exception => false })
          else if (now - newest(f) > ageMs)
            // phase 2: a full window has passed since observation (the
            // marker's own mtime is included in newest), nothing inside
            // moved — dead
            rmRf(f)
        } else if (n.endsWith(".lock") &&
          !new java.io.File(tmp, n.stripSuffix(".lock")).exists() &&
          now - f.lastModified() > ageMs) {
          // a dangling lock file: its generation is gone and nobody has
          // touched it for the window
          rmRf(f)
        }
      }
    }
  }

  private def newest(f: java.io.File): Long =
    if (f.isDirectory)
      (f.lastModified() +: Option(f.listFiles()).getOrElse(Array.empty)
        .map(newest).toSeq).max
    else f.lastModified()

  private def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
    f.delete(); ()
  }

  /** One-time sweep for fixture dirs keyed by the PRE-r16 naming scheme
    * (`math.abs(String.hashCode)` decimal keys, replaced by
    * [[key8]] MD5 hex): nothing can ever reference or rebuild those
    * names again, so on long-lived boxes they are a permanent leak the
    * age-gated sibling reaper cannot see (its prefixes now carry hex
    * keys). Decimal keys are 1-10 digits (positive int range); real
    * key8 values are 16 hex chars, so the patterns cannot collide.
    * Age-gated like the sibling reaper in case an old-build JVM is
    * somehow still serving them. Called once per driver entry point
    * (Bench / Verify). */
  def reapLegacyNames(ageMs: Long = ReapAgeMs): Unit = {
    val legacy = ("""graft_(?:pruned|bloom|morread|upsread|bucketed|""" +
      """evsrc|cdcfeed|st11|part|zorder|joinprune)_g\d{1,10}""" +
      """(?:\.lock)?|graft_xseed_\w+_\d{1,10}_.*""").r
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val now = System.currentTimeMillis()
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (legacy.matches(f.getName) && now - newest(f) > ageMs)
        rmRf(f)
    }
  }

  /** JVM + OS file lock keyed by `name`: single writer ACROSS processes
    * for a shared /tmp generation (a streaming checkpoint or a staged
    * object set must never have two concurrent builders); readers need
    * no lock — generations publish atomically (rename / marker-guarded
    * commit) and are immutable once published. */
  def withFileLock[T](name: String)(f: => T): T =
    jvmLocks.getOrElseUpdate(name, new Object).synchronized {
      val lockPath = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), s"$name.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      // the channel must close even when lock() itself throws (fs
      // without byte-range locks, transient IO) — else every failing
      // call leaks a file descriptor in a long-lived session
      try {
        val flk = ch.lock()
        try f finally flk.release()
      } finally ch.close()
    }
}
