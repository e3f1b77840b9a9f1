package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path

/** The fork-free local filesystem's status contract: one NIO stat per
  * file (no `ls -ld` forks — permissions arrive eagerly), and the
  * status PATH carries Hadoop's canonical empty-authority URI form
  * (`file:///p`). The URI form is load-bearing: streaming file sources
  * key their seen-files map on `getPath.toUri.toString`, so a status
  * that renders `file:/p` (null authority — Path.toString hides the
  * difference) makes every file checkpointed under the old form look
  * NEW on restart and re-delivers whole sources (caught as doubled
  * st09 index rows by the driver gate in round 16). */
class LocalFsStatusSpec extends SparkSpec {

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("statuses render the empty-authority file:/// URI form") {
    val d = Paths.get(tmpDir("fsstatus"))
    Files.writeString(d.resolve("a.txt"), "x")
    assert(fs.isInstanceOf[graft.sources.GraftLocalFileSystem])
    val st = fs.getFileStatus(new Path(d.resolve("a.txt").toString))
    assert(st.getPath.toUri.toString.startsWith("file:///"),
      s"getFileStatus URI form regressed: ${st.getPath.toUri}")
    val listed = fs.listStatus(new Path(d.toString))
    assert(listed.nonEmpty)
    listed.foreach(s => assert(s.getPath.toUri.toString.startsWith("file:///"),
      s"listStatus URI form regressed: ${s.getPath.toUri}"))
    val it = fs.listFiles(new Path(d.toString), true)
    while (it.hasNext) {
      val s = it.next()
      assert(s.getPath.toUri.toString.startsWith("file:///"))
      // LocatedFileStatus copies the permission EAGERLY — with the NIO
      // status this is fork-free and must be the file's real mode
      assert(s.getPermission != null)
    }
  }

  test("status fields match the java.io view") {
    val d = Paths.get(tmpDir("fsstatus2"))
    val f = d.resolve("b.txt")
    Files.writeString(f, "hello")
    val st = fs.getFileStatus(new Path(f.toString))
    assert(st.getLen === 5L)
    assert(!st.isDirectory)
    assert(st.getModificationTime === f.toFile.lastModified())
    val dirSt = fs.getFileStatus(new Path(d.toString))
    assert(dirSt.isDirectory)
    intercept[java.io.FileNotFoundException] {
      fs.getFileStatus(new Path(d.resolve("nope").toString))
    }
    intercept[java.io.FileNotFoundException] {
      fs.listStatus(new Path(d.resolve("nope").toString))
    }
  }
}
