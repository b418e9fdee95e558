package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Branches, tags and write-audit-publish over the FW manifest:
  * staged commits move only their branch ref, `main` freezes the
  * default view, publish fast-forwards atomically, dropStage rolls the
  * staged files back, and every OTHER commit path refuses while a
  * stage is pending (a snapshot is a full listing — committing around
  * a stage would leak it into main).
  */
class FwWapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"

  private def write(dir: String, rows: Seq[(Long, String, Double)],
      mode: String, branch: Option[String] = None): Unit = {
    val w = rows.toDF("id", "name", "score").repartition(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
    branch.fold(w)(b => w.option("branch", b)).mode(mode).save(dir)
  }

  private def read(dir: String, branch: Option[String] = None) = {
    val r = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec)
    branch.fold(r)(b => r.option("branch", b)).load(dir)
  }

  private def ids(dir: String, branch: Option[String] = None): Set[Long] =
    read(dir, branch).select("id").collect().map(_.getLong(0)).toSet

  test("staging freezes main; branch readers see the stage; publish " +
      "fast-forwards the default view") {
    val dir = Files.createTempDirectory("fwwap1").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0)), "overwrite")
    write(dir, Seq((3L, "c", 3.0)), "append", Some("audit"))
    assert(ids(dir) === Set(1L, 2L), "default view must not move")
    assert(ids(dir, Some("audit")) === Set(1L, 2L, 3L))
    assert(ids(dir, Some("main")) === Set(1L, 2L))
    assert(FwVersions.currentMax(dir) === 2L)

    val r = FwMaintenance.publish(dir, "audit")
    assert(r.publishedVersion === 2L && r.previousMain === 1L)
    assert(ids(dir) === Set(1L, 2L, 3L))
    assert(FwRefs.get(dir, "audit").isEmpty)
    // post-publish plain writes fast-forward main
    write(dir, Seq((4L, "d", 4.0)), "append")
    assert(ids(dir) === Set(1L, 2L, 3L, 4L))
    assert(FwRefs.mainVersion(dir) === Some(3L))
  }

  test("plain and maintenance commits refuse while a stage is " +
      "pending, with zero torn state") {
    val dir = Files.createTempDirectory("fwwap2").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append", Some("audit"))
    val before = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".fw")).map(_.getName).toSet
    val e = intercept[Exception] {
      write(dir, Seq((9L, "z", 9.0)), "append")
    }
    assert(chain(e).exists(_.getMessage != null)
      && chain(e).exists(m => m.getMessage != null
        && m.getMessage.contains("pending stage")))
    val after = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".fw")).map(_.getName).toSet
    assert(after === before, "failed commit must publish nothing")
    assert(FwVersions.currentMax(dir) === 2L)
    intercept[Exception] {
      FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20)
    }
    intercept[Exception] { FwMaintenance.truncateRetain(dir) }
    // a SECOND stage branch is refused; re-staging the SAME branch grows it
    intercept[Exception] {
      write(dir, Seq((7L, "y", 7.0)), "append", Some("other"))
    }
    write(dir, Seq((3L, "c", 3.0)), "append", Some("audit"))
    assert(ids(dir, Some("audit")) === Set(1L, 2L, 3L))
    assert(ids(dir) === Set(1L))
  }

  test("dropStage removes the staged files and reopens the table") {
    val dir = Files.createTempDirectory("fwwap3").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append", Some("audit"))
    val r = FwMaintenance.dropStage(spark, dir, "audit")
    assert(r.droppedVersions === 1)
    assert(ids(dir) === Set(1L))
    assert(FwRefs.read(dir).map(_.name) === Seq("main"))
    // table is writable again, both plain and staged
    write(dir, Seq((5L, "e", 5.0)), "append")
    assert(ids(dir) === Set(1L, 5L))
    write(dir, Seq((6L, "f", 6.0)), "append", Some("audit2"))
    assert(ids(dir) === Set(1L, 5L))
    assert(ids(dir, Some("audit2")) === Set(1L, 5L, 6L))
  }

  test("tags pin a version through vacuum until deleted") {
    val dir = Files.createTempDirectory("fwwap4").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    FwMaintenance.tag(dir, "rel_1", 1L)
    write(dir, Seq((2L, "b", 2.0)), "append")
    write(dir, Seq((3L, "c", 3.0)), "append")
    FwMaintenance.vacuum(spark, dir, retainLast = 1)
    // v1 outlived the retention window via the tag
    assert(ids(dir, Some("rel_1")) === Set(1L))
    assert(ids(dir) === Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      FwMaintenance.tag(dir, "rel_1", 2L) // immutable
    }
    FwMaintenance.deleteTag(dir, "rel_1")
    FwMaintenance.vacuum(spark, dir, retainLast = 1)
    intercept[IllegalArgumentException] {
      read(dir, Some("rel_1")).count()
    }
  }

  test("rollback clamps branches to the target and kills tags above it") {
    val dir = Files.createTempDirectory("fwwap5").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append")
    FwMaintenance.tag(dir, "rel_2", 2L)
    FwMaintenance.rollback(spark, dir, 1L)
    assert(FwRefs.get(dir, "rel_2").isEmpty, "tag above target dies")
    assert(FwRefs.mainVersion(dir) === Some(1L), "main clamps")
    assert(ids(dir) === Set(1L))
  }

  test("SQL VERSION AS OF resolves branch and tag names through the " +
      "catalog") {
    val dir = Files.createTempDirectory("fwwap6").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwwapc", "graft.sources.FwCatalog")
    spark.sql("DROP TABLE IF EXISTS fwwapc.ns.t")
    spark.sql(s"""CREATE TABLE fwwapc.ns.t (id BIGINT, name STRING,
      score DOUBLE) OPTIONS (path '$dir', widths '4,6,10')""")
    spark.sql("INSERT INTO fwwapc.ns.t VALUES (1, 'a', 1.0)")
    FwMaintenance.tag(dir, "rel_1", 1L)
    spark.sql("INSERT INTO fwwapc.ns.t VALUES (2, 'b', 2.0)")
    write(dir, Seq((3L, "c", 3.0)), "append", Some("audit"))
    assert(spark.sql(
      "SELECT id FROM fwwapc.ns.t VERSION AS OF 'rel_1'")
      .collect().map(_.getLong(0)).toSet === Set(1L))
    assert(spark.sql(
      "SELECT id FROM fwwapc.ns.t VERSION AS OF 'audit'")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    assert(spark.table("fwwapc.ns.t")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L),
      "default view stays at main")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM fwwapc.ns.t VERSION AS OF 'nope'")
        .collect()
    }
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("no branch or tag 'nope'")))
    FwMaintenance.dropStage(spark, dir, "audit")
  }

  test("tagging a table does not break streaming reads; streams " +
      "follow main across a WAP cycle") {
    val dir = Files.createTempDirectory("fwwap9").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("fwwap9ck").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0), (2L, "b", 2.0)), "overwrite")
    // tagging creates the main ref — the implicit main-pin must stay a
    // batch default, not a streaming "versionAsOf is batch-only" trap
    FwMaintenance.tag(dir, "v1", FwVersions.currentMax(dir))
    val q = spark.readStream.format("graft.sources.FixedWidth")
      .option("schema", spec).load(dir)
      .writeStream.format("memory").queryName("fwwap9_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("fwwap9_sink").count() === 2L,
        "a tagged table must still serve streaming reads")
      write(dir, Seq((3L, "c", 3.0)), "append", Some("audit"))
      q.processAllAvailable()
      assert(spark.table("fwwap9_sink").count() === 2L,
        "WAP-staged rows must not leak into the stream before publish")
      FwMaintenance.publish(dir, "audit")
      q.processAllAvailable()
      assert(spark.table("fwwap9_sink").count() === 3L,
        "published rows must flow to the stream")
    } finally q.stop()
  }

  private def chain(t: Throwable): Seq[Throwable] = {
    var cur = t
    val b = Seq.newBuilder[Throwable]
    while (cur != null) { b += cur; cur = cur.getCause }
    b.result()
  }
}
