package graft

import org.apache.spark.sql.functions._

import graft.meta.GraftTable

/** Branch refs + write-audit-publish: staged commits are invisible on
  * main until one atomic fast-forward publishes them; expiry never
  * reclaims a branch head. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() = {
    val t = GraftTable.create(spark, tmpDir("branch") + "/t",
      Seq((0L, "x")).toDF("id", "tag").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    t
  }

  test("write-audit-publish: staged rows invisible until fastForward") {
    val t = freshTable()
    t.createBranch("audit")
    t.appendToBranch("audit", Seq((3L, "c"), (4L, "BAD")).toDF("id", "tag"))
    // audit sees the staged state; main does not
    assert(t.readBranch("audit").count() == 4)
    assert(t.read.count() == 2, "main isolated from staged writes")
    // audit step: validation fails → fix on the branch (another commit)
    assert(t.readBranch("audit").filter($"tag" === "BAD").count() == 1)
    t.appendToBranch("audit", Seq((5L, "fix")).toDF("id", "tag"))
    // publish: one atomic ref move
    t.fastForward("main", "audit")
    assert(t.read.count() == 5)
    assert(t.branches("main") == t.branches("audit"))
  }

  test("branch diff reads ONLY the staged files (x27's audit contract)") {
    val t = freshTable()
    val mainFiles = t.files.select("path").collect().map(_.getString(0)).toSet
    t.createBranch("audit")
    t.appendToBranch("audit", Seq((3L, "c"), (4L, "d")).toDF("id", "tag"))
    t.appendToBranch("audit", Seq((5L, "e")).toDF("id", "tag"))
    val diff = t.readIncremental(t.branches("main"), t.branches("audit"))
    assert(diff.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L))
    // the audit scans exactly the staged files — never main's data;
    // at 100 TB this is what makes auditing a 1% staging a 1% read
    val scanned = diff.inputFiles.map(graft.meta.GraftTable.normalize).toSet
    assert(scanned.nonEmpty &&
      scanned.intersect(mainFiles.map(graft.meta.GraftTable.normalize)).isEmpty,
      s"audit read touched main files: $scanned vs $mainFiles")
  }

  test("main keeps committing independently; diverged publish is refused") {
    val t = freshTable()
    t.createBranch("audit")
    t.appendToBranch("audit", Seq((3L, "c")).toDF("id", "tag"))
    t.append(Seq((10L, "m")).toDF("id", "tag")) // main advances too
    assert(t.read.count() == 3)
    assert(t.readBranch("audit").count() == 3)
    val e = intercept[IllegalArgumentException](t.fastForward("main", "audit"))
    assert(e.getMessage.contains("fast-forward"))
  }

  test("branch at an old snapshot + drop; expiry pins branch heads") {
    val clock = new TestClock()
    val t = GraftTable.create(spark, tmpDir("branch") + "/t",
      Seq((0L, "x")).toDF("id", "tag").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), clock) // snapshot 1
    t.append(Seq((3L, "c")).toDF("id", "tag"), clock) // snapshot 2
    t.createBranch("pin", at = Some(1L))
    assert(t.readBranch("pin").count() == 2)

    clock.advanceDays(30)
    t.append(Seq((4L, "d")).toDF("id", "tag"), clock) // fresh current
    val removed = t.expireSnapshots(retentionDays = 7, clock)
    // snapshot 1 survives (pinned by the branch); snapshot 2 expired
    assert(t.snapshots.map(_.snapshotId).contains(1L))
    assert(!t.snapshots.map(_.snapshotId).contains(2L))
    assert(t.readBranch("pin").count() == 2, "pinned head still readable")
    t.dropBranch("pin")
    assert(!t.branches.contains("pin"))
    intercept[IllegalArgumentException](t.dropBranch("main"))
    assert(removed >= 0)
  }

  test("tags: immutable refs — create, read, collide, refuse fast-forward") {
    val t = freshTable() // snapshot 1
    t.append(Seq((3L, "c")).toDF("id", "tag")) // snapshot 2
    t.createTag("v1", at = Some(1L))
    t.createTag("release") // defaults to current head (2)
    assert(t.tags == Map("v1" -> 1L, "release" -> 2L))
    assert(t.readTag("v1").count() == 2)
    assert(t.readTag("release").count() == 3)
    // the tag never moves as the table advances
    t.append(Seq((4L, "d")).toDF("id", "tag"))
    assert(t.readTag("release").count() == 3)
    // shared namespace with branches, both directions
    intercept[IllegalArgumentException](t.createBranch("v1"))
    t.createBranch("audit")
    intercept[IllegalArgumentException](t.createTag("audit"))
    intercept[IllegalArgumentException](t.createTag("v1")) // duplicate
    // immutability: no fast-forward onto or from a tag
    intercept[IllegalArgumentException](t.fastForward("v1", "audit"))
    intercept[IllegalArgumentException](t.fastForward("main", "v1"))
    // no appends through the branch path either (tags are not branches)
    intercept[IllegalArgumentException](
      t.appendToBranch("v1", Seq((9L, "z")).toDF("id", "tag")))
    t.dropTag("v1")
    assert(!t.tags.contains("v1"))
    intercept[IllegalArgumentException](t.dropTag("v1"))
  }

  test("expiry pins tag targets like branch heads") {
    val clock = new TestClock()
    val t = GraftTable.create(spark, tmpDir("branch") + "/t",
      Seq((0L, "x")).toDF("id", "tag").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), clock) // snapshot 1
    t.append(Seq((3L, "c")).toDF("id", "tag"), clock)            // snapshot 2
    t.createTag("keep", at = Some(1L))
    clock.advanceDays(30)
    t.append(Seq((4L, "d")).toDF("id", "tag"), clock) // fresh current
    t.expireSnapshots(retentionDays = 7, clock)
    // snapshot 1 survives (tag-pinned); untagged snapshot 2 expired
    assert(t.snapshots.map(_.snapshotId).contains(1L))
    assert(!t.snapshots.map(_.snapshotId).contains(2L))
    assert(t.readTag("keep").count() == 2, "tagged snapshot still readable")
    // dropping the tag un-pins it for the next expiry pass
    t.dropTag("keep")
    t.expireSnapshots(retentionDays = 7, clock)
    assert(!t.snapshots.map(_.snapshotId).contains(1L))
  }

  test("appendToBranch to a nonexistent branch is refused") {
    val t = freshTable()
    intercept[IllegalArgumentException](
      t.appendToBranch("nope", Seq((9L, "z")).toDF("id", "tag")))
  }
}
