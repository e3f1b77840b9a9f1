package graft.ext

/** The scoped-streaming-conf-window invariant, as a checked guard: a
  * RelCache relation first materialized by a thread OTHER than the one
  * holding StreamOps' scoped conf window would bake the scoped
  * 8-partition value into a session-lifetime persisted plan (the race
  * Bench's two-phase warmup exists to prevent — this spec keeps the
  * invariant hot per VERDICT r14 item 6). */
class RelCacheGuardSpec extends graft.SparkSpec {
  private def owner = graft.streaming.StreamOps.scopedConfWindowOwner

  test("RelCache build fails loudly when another thread holds the scoped conf window") {
    val dummy = new Thread("dummy-scoped-window-holder")
    owner.set(dummy)
    try {
      val ex = intercept[IllegalArgumentException] {
        RelCache.cached(spark, s"guard_fail_${System.nanoTime()}") {
          spark.range(1).toDF("x")
        }.count()
      }
      assert(ex.getMessage.contains("scoped streaming conf window"))
    } finally owner.set(null)
  }

  test("RelCache build inside the window-holding thread itself is legitimate") {
    owner.set(Thread.currentThread())
    try assert(RelCache.cached(spark, s"guard_ok_${System.nanoTime()}") {
      spark.range(2).toDF("x")
    }.count() == 2)
    finally owner.set(null)
  }

  test("with no window held, builds proceed normally") {
    assert(RelCache.cached(spark, s"guard_free_${System.nanoTime()}") {
      spark.range(3).toDF("x")
    }.count() == 3)
  }
}
