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

  /** How long a SUPERSEDED generation must sit untouched before
    * [[reapStaleSiblings]] reclaims it. Readers derive every generation
    * path from the CURRENT source fingerprint and materialize within
    * seconds of planning, so hours of slack is already conservative —
    * the window exists for the pathological replan-after-regeneration
    * straggler. */
  val ReapAgeMs: Long = 6L * 3600 * 1000

  /** Opportunistic reaper for superseded fingerprint-keyed generations
    * (ADVICE r15): tmpdir siblings named `prefix*` OTHER than
    * `keepName` — i.e. same tag + source-dir key, different source
    * fingerprint — whose newest mtime is older than `ageMs` are
    * deleted, bounding tmpdir growth on long-lived boxes to the live
    * generation per (tag, source). Call while holding the CURRENT
    * generation's file lock: old-fingerprint generations can gain no
    * new writer (the fingerprint derives from source mtimes, which
    * never revert), so age alone certifies them dead. A sibling's
    * `.lock` file goes only once its directory is gone. */
  def reapStaleSiblings(keepName: String, prefix: String,
                        ageMs: Long = ReapAgeMs): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val now = System.currentTimeMillis()
    def newest(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified() +: Option(f.listFiles()).getOrElse(Array.empty)
          .map(newest).toSeq).max
      else f.lastModified()
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
      f.delete(); ()
    }
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (n.startsWith(prefix) && n != keepName && n != s"$keepName.lock") {
        val isStaleDir = f.isDirectory && now - newest(f) > ageMs
        // a dangling lock file: its generation is gone and nobody has
        // touched it for the window (builders create their dir promptly)
        val isStaleLock = !f.isDirectory && n.endsWith(".lock") &&
          !new java.io.File(tmp, n.stripSuffix(".lock")).exists() &&
          now - f.lastModified() > ageMs
        if (isStaleDir || isStaleLock) rmRf(f)
      }
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
