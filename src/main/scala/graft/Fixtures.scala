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
