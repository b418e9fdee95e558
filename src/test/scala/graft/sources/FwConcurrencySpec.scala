package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Optimistic concurrency on FW manifest commits (round-9 VERDICT ask
  * #3): maintenance ops plan lock-free, then re-check the manifest
  * version inside the commit lock before publishing — the loser of an
  * interleave sweeps its tmp outputs and raises
  * ConcurrentModificationException; nothing is silently lost.
  */
class FwConcurrencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"

  private def write(dir: String, rows: Seq[(Long, String, Double)],
      mode: String, parts: Int = 1): Unit =
    rows.toDF("id", "name", "score").repartition(parts)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode(mode).save(dir)

  private def readAll(dir: String) = spark.read
    .format("graft.sources.FixedWidth").option("schema", spec).load(dir)

  test("two interleaved writers: the compaction that planned against " +
      "a stale version sweeps its outputs and raises; the rival " +
      "commit survives") {
    val dir = Files.createTempDirectory("fwocc1").toFile.getAbsolutePath
    // v1: four small files worth compacting
    write(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)), "overwrite", parts = 4)
    assert(FwVersions.currentMax(dir) === 1L)

    // writer A (the eventual winner) holds the commit lock first —
    // writer B's publish phase will block on it
    val lock = new java.io.File(dir, "_fw_versions.lock")
    Files.createFile(lock.toPath)

    // writer B: plans compaction against v1, computes its tmps, then
    // blocks trying to enter the publish critical section
    @volatile var bError: Throwable = null
    val b = new Thread(() => {
      try FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20)
      catch { case t: Throwable => bError = t }
    })
    b.start()
    // wait until B has produced its compacted tmp (so we know it is
    // past planning and parked on the lock)
    val deadline = System.currentTimeMillis() + 30000
    def compactTmps() = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("compact-")
        && f.getName.endsWith(".tmp"))
    while (compactTmps().isEmpty
      && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(compactTmps().nonEmpty, "compaction never produced its tmp")

    // writer A commits under the lock it holds: a new data file plus
    // the snapshot — exactly what a concurrent append does
    val extra = new java.io.File(dir, "rival.fw")
    Files.write(extra.toPath,
      "   9z            9.0\n".getBytes("UTF-8"))
    assert(FwVersions.commitSnapshotLocked(dir) === 2L)
    lock.delete() // A releases; B may now enter its critical section

    b.join(30000)
    assert(!b.isAlive, "compaction thread hung")
    assert(bError != null, "stale compaction must not commit")
    assert(bError.isInstanceOf[java.util.ConcurrentModificationException],
      s"got $bError")
    assert(bError.getMessage.contains("planned against version 1"),
      bError.getMessage)
    // exactly one commit happened: A's v2 is the head, B burned nothing
    assert(FwVersions.currentMax(dir) === 2L)
    // the loser's files are swept: no compact outputs, no stray tmps
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("compact-")), names.toSeq)
    assert(!names.exists(_.endsWith(".tmp")), names.toSeq)
    // nothing was lost: all five records read, inputs intact
    assert(readAll(dir).count() === 5L)
    assert(readAll(dir).filter(col("id") === 9L).count() === 1L)
  }

  test("merge loses the same race cleanly: stale plan sweeps its " +
      "rewrite tmps, the table keeps the rival's state") {
    val dir = Files.createTempDirectory("fwocc2").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0)), "overwrite")
    val lock = new java.io.File(dir, "_fw_versions.lock")
    Files.createFile(lock.toPath)
    @volatile var bError: Throwable = null
    val schema = FixedWidth.parseSchema(spec)
    val b = new Thread(() => {
      try FwMaintenance.merge(spark, dir, schema,
        Seq((1L, "A", 10.0)).toDF("id", "name", "score"), "id")
      catch { case t: Throwable => bError = t }
    })
    b.start()
    def mergeTmps() = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("merge-")
        && f.getName.endsWith(".tmp"))
    val deadline = System.currentTimeMillis() + 30000
    while (mergeTmps().isEmpty
      && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(mergeTmps().nonEmpty, "merge never produced its tmp")
    val extra = new java.io.File(dir, "rival.fw")
    Files.write(extra.toPath,
      "   9z            9.0\n".getBytes("UTF-8"))
    FwVersions.commitSnapshotLocked(dir)
    lock.delete()
    b.join(30000)
    assert(bError != null
      && bError.isInstanceOf[java.util.ConcurrentModificationException],
      s"got $bError")
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".tmp")), names.toSeq)
    // the update never applied, the rival's row did
    assert(readAll(dir).filter(col("name") === "A").count() === 0L)
    assert(readAll(dir).count() === 3L)
  }

  test("non-conflicting sequential committers just serialize: append " +
      "after append lands as v2 with both files") {
    val dir = Files.createTempDirectory("fwocc3").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append")
    assert(FwVersions.currentMax(dir) === 2L)
    assert(readAll(dir).count() === 2L)
    assert(!new java.io.File(dir, "_fw_versions.lock").exists(),
      "commit lock must be released")
  }

  test("a SQL UPDATE (row-level COW) that planned against a stale " +
      "version sweeps its cow tmps and raises; the rival commit wins") {
    val dir = Files.createTempDirectory("fwocc5").toFile.getAbsolutePath
    val s = {
      val sp = spark
      sp.conf.set("spark.sql.catalog.fwocc", classOf[FwCatalog].getName)
      sp
    }
    s.sql(s"""CREATE TABLE fwocc.ns.t (id BIGINT, name STRING,
      score DOUBLE) OPTIONS (path '$dir', widths '4,6,10')""")
    s.sql("INSERT INTO fwocc.ns.t VALUES (1,'a',1.0), (2,'b',2.0)")
    assert(FwVersions.currentMax(dir) === 1L)

    val lock = new java.io.File(dir, "_fw_versions.lock")
    Files.createFile(lock.toPath)
    @volatile var uError: Throwable = null
    val u = new Thread(() => {
      try s.sql("UPDATE fwocc.ns.t SET score = 9.0 WHERE id = 1")
      catch { case t: Throwable => uError = t }
    })
    u.start()
    // wait for the rewrite's replacement tmp, so the UPDATE is past
    // its write tasks and parked on the commit lock
    val deadline = System.currentTimeMillis() + 30000
    def cowTmps() = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("cow-")
        && f.getName.endsWith(".tmp"))
    while (cowTmps().isEmpty
      && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(cowTmps().nonEmpty, "UPDATE never produced its cow tmp")

    // the rival commits v2 under the lock, then releases
    val extra = new java.io.File(dir, "rival.fw")
    Files.write(extra.toPath,
      "   9z            9.0\n".getBytes("UTF-8"))
    assert(FwVersions.commitSnapshotLocked(dir) === 2L)
    lock.delete()

    u.join(30000)
    assert(!u.isAlive, "UPDATE thread hung")
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(uError != null && causes(uError).exists(
      _.isInstanceOf[java.util.ConcurrentModificationException]),
      s"stale UPDATE must raise ConcurrentModification, got $uError")
    // loser swept: no cow tmps, no cow files published, no v3
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(n => n.startsWith("cow-")), names.toSeq)
    assert(FwVersions.currentMax(dir) === 2L)
    // the update never applied; both original rows and the rival live
    assert(readAll(dir).filter(col("score") === 9.0).count() === 1L,
      "only the rival's 9.0 row exists")
    assert(readAll(dir).count() === 3L)
  }

  test("a crashed writer's stale lock is broken; a fresh lock is " +
      "honored until timeout") {
    val dir = Files.createTempDirectory("fwocc4").toFile.getAbsolutePath
    new java.io.File(dir).mkdirs()
    val lock = new java.io.File(dir, "_fw_versions.lock")
    Files.createFile(lock.toPath)
    assert(lock.setLastModified(
      System.currentTimeMillis() - FwVersions.LockStaleMillis - 60000))
    // stale: withLock breaks it and proceeds
    val got = FwVersions.withLock(dir) { 42 }
    assert(got === 42)
    assert(!lock.exists())
  }
}
