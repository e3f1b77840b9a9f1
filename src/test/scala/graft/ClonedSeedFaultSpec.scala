package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import graft.meta.GraftTable
import graft.sched.MaintenanceQueries

/** The clonedSeed build-once fixture's crash contract (the stamp-LAST
  * protocol every x-family seed rests on): a stamped generation never
  * rebuilds — every later call clones it; an UNSTAMPED generation (a
  * build that crashed before its `_fp` stamp) is torn down and rebuilt
  * on the next call; and each clone is independent — mutating one
  * clone's log never leaks into the fixture or a sibling clone. */
class ClonedSeedFaultSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("stamped builds once; unstamped (crashed) rebuilds; clones are isolated") {
    val tag = s"faultspec${System.nanoTime() % 1000000}"
    val builds = new AtomicInteger(0)
    def seed() = MaintenanceQueries.clonedSeed(spark, sfDir, tag, "part") {
      fx =>
        builds.incrementAndGet()
        val df = spark.read.parquet(s"$sfDir/part.parquet")
        val t = GraftTable.create(spark, fx.resolve("t").toString, df.schema)
        t.append(df.limit(20).repartition(1))
    }
    val c1 = seed()
    assert(builds.get() == 1)
    val rows1 = GraftTable.load(spark, c1.resolve("t").toString).read.count()
    assert(rows1 == 20L)

    // stamped: a second call clones WITHOUT rebuilding
    val c2 = seed()
    assert(builds.get() == 1, "a stamped generation must never rebuild")
    assert(c1 != c2, "each run gets its own clone")

    // clone isolation: appending to clone 2 must not move clone 1 or
    // a fresh clone 3 (the fixture's metadata is the shared basis)
    val t2 = GraftTable.load(spark, c2.resolve("t").toString)
    val df = spark.read.parquet(s"$sfDir/part.parquet")
    t2.append(df.limit(5).repartition(1))
    assert(t2.read.count() == 25L)
    assert(GraftTable.load(spark, c1.resolve("t").toString).read.count()
      == 20L, "a sibling clone must not see another clone's commit")
    assert(GraftTable.load(spark, seed().resolve("t").toString).read.count()
      == 20L, "a fresh clone reflects the fixture, not a sibling's commit")
    assert(builds.get() == 1)

    // crash simulation: delete the stamp — the generation is now
    // indistinguishable from a build that died mid-write
    val fixture = Files.list(
        Paths.get(System.getProperty("java.io.tmpdir")))
      .filter(_.getFileName.toString.startsWith(s"graft_xseed_${tag}_"))
      .filter(p => !p.getFileName.toString.endsWith(".lock"))
      .findFirst().get()
    Files.delete(fixture.resolve("_fp"))
    val c4 = seed()
    assert(builds.get() == 2, "an unstamped generation must rebuild")
    assert(GraftTable.load(spark, c4.resolve("t").toString).read.count()
      == 20L)
  }
}
