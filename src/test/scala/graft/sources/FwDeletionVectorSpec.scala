package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Merge-on-read deletes via deletion vectors (round-9 VERDICT ask #5):
  * a key-set delete publishes `.fwdv` sidecars instead of rewriting
  * files; scans skip the voided ordinals; version pins before the
  * delete still see the rows; compaction materializes the vectors
  * away; rollback rolls the delete itself back.
  */
class FwDeletionVectorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"
  private val schema = FixedWidth.parseSchema(spec)

  private def freshTable(rows: Seq[(Long, String, Double)],
      parts: Int = 2): String = {
    val dir = Files.createTempDirectory("fwdv").toFile.getAbsolutePath
    rows.toDF("id", "name", "score").repartitionByRange(parts, col("id"))
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("overwrite").save(dir)
    dir
  }

  private def readAll(dir: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec)
    opts.foldLeft(r)((r, kv) => r.option(kv._1, kv._2)).load(dir)
  }

  private def rows8 = (1L to 8L).map(i => (i, s"n$i", i * 1.5))

  test("MoR delete: zero data bytes rewritten, live reads skip the " +
      "rows, versionAsOf=1 still sees them, absent keys are no-ops") {
    val dir = freshTable(rows8)
    val before = FwFiles.list(dir).map(f => (f.getName, f.length(),
      f.lastModified())).toSeq
    val report = FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(2L, 5L, 777L).toDF("id"), "id")
    assert(report.version === 2L)
    assert(report.rowsDeleted === 2L)
    assert(report.dvFilesWritten === 2)
    // zero rewrites: the data files are byte-identical, same inodes
    val after = FwFiles.list(dir).map(f => (f.getName, f.length(),
      f.lastModified())).toSeq
    assert(after === before, "MoR delete must not touch data files")
    assert(readAll(dir).select("id").as[Long].collect().sorted
      === Array(1L, 3L, 4L, 6L, 7L, 8L))
    // filters and projections still work over the skip
    assert(readAll(dir).filter(col("id") <= 4L).count() === 3L)
    // the pin BEFORE the delete reads all 8
    assert(readAll(dir, Map("versionAsOf" -> "1")).count() === 8L)
    assert(readAll(dir, Map("versionAsOf" -> "2")).count() === 6L)
  }

  test("repeated MoR deletes stack as versioned entries; re-deleting " +
      "a dead key is not double-counted; time travel sees each stage") {
    val dir = freshTable(rows8)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(2L).toDF("id"), "id") // v2
    val r2 = FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(2L, 3L).toDF("id"), "id") // v3: key 2 already dead
    assert(r2.version === 3L)
    assert(r2.rowsDeleted === 1L, "key 2 was already deleted")
    assert(readAll(dir).count() === 6L)
    assert(readAll(dir, Map("versionAsOf" -> "1")).count() === 8L)
    assert(readAll(dir, Map("versionAsOf" -> "2")).count() === 7L)
    assert(readAll(dir, Map("versionAsOf" -> "3")).count() === 6L)
  }

  test("metadata-only answers stand down under a DV: COUNT/MIN/MAX " +
      "run as a scan and return the LIVE values") {
    val dir = freshTable(rows8)
    // pre-DV: count(*) answers from metadata
    val aggBefore = readAll(dir).agg(count(lit(1)), min("id"), max("id"))
    assert(aggBefore.collect().head.toSeq === Seq(8L, 1L, 8L))
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(1L, 8L).toDF("id"), "id") // the extremes die
    val agg = readAll(dir).agg(count(lit(1)).as("n"),
      min("id").as("lo"), max("id").as("hi"))
    assert(agg.collect().head.toSeq === Seq(6L, 2L, 7L))
    // a version pin before the delete still answers pre-delete values
    val pinned = readAll(dir, Map("versionAsOf" -> "1"))
      .agg(count(lit(1)), min("id"), max("id"))
    assert(pinned.collect().head.toSeq === Seq(8L, 1L, 8L))
  }

  test("COW merge on a DV'd table does not resurrect dead rows and " +
      "materializes the vector away in the live set") {
    val dir = freshTable(rows8, parts = 1)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(3L).toDF("id"), "id") // v2
    // update key 5 -> the single file rewrites under COW (v3)
    FwMaintenance.merge(spark, dir, schema,
      Seq((5L, "UPD", 99.0)).toDF("id", "name", "score"), "id")
    val got = readAll(dir).select("id", "name").as[(Long, String)]
      .collect().toMap
    assert(!got.contains(3L), "rewrite must not resurrect a DV'd row")
    assert(got(5L) === "UPD")
    assert(got.size === 7)
    // materialized away in the LIVE set: no live file carries a DV
    assert(FwFiles.list(dir).forall(f => FwDv.read(f.getPath).isEmpty),
      "the COW rewrite materialized the DV out of the live files")
    // the superseded input is RETAINED with its DV: the pre-merge pin
    // still skips key 3 and still reads the pre-update key 5
    val v2 = readAll(dir, Map("versionAsOf" -> "2"))
      .select("id", "name").as[(Long, String)].collect().toMap
    assert(v2.size === 7 && !v2.contains(3L) && v2(5L) === "n5")
    assert(readAll(dir, Map("versionAsOf" -> "1")).count() === 8L)
    // vacuum to the newest version sweeps the retained file AND its DV
    FwMaintenance.vacuum(spark, dir, retainLast = 1)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".fwdv")) === 0,
      "vacuum sweeps retained DVs with their files")
    assert(readAll(dir).count() === 7L)
  }

  test("compaction materializes DVs away: records drop, sidecars " +
      "vanish, subsequent reads and pins behave") {
    val dir = freshTable(rows8, parts = 4)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(2L, 7L).toDF("id"), "id") // v2
    val report = FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20)
    assert(report.committedVersion.contains(3L))
    assert(FwFiles.list(dir).forall(f => FwDv.read(f.getPath).isEmpty),
      "compaction materializes the DVs out of the live files")
    assert(readAll(dir).select("id").as[Long].collect().sorted
      === Array(1L, 3L, 4L, 5L, 6L, 8L))
    // count(*) pushdown is metadata-only again post-materialization
    assert(readAll(dir).count() === 6L)
    assert(readAll(dir, Map("versionAsOf" -> "3")).count() === 6L)
    // the compacted inputs are retained with their DVs for the pins
    assert(readAll(dir, Map("versionAsOf" -> "2")).count() === 6L)
    assert(readAll(dir, Map("versionAsOf" -> "1")).count() === 8L)
    // vacuum to the newest version sweeps retained files and DVs
    FwMaintenance.vacuum(spark, dir, retainLast = 1)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".fwdv")) === 0,
      "vacuum sweeps retained DVs with their files")
    assert(readAll(dir).count() === 6L)
  }

  test("rollback before the delete rolls the delete back: entries " +
      "past the target version are trimmed and the rows return") {
    val dir = freshTable(rows8)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(4L).toDF("id"), "id") // v2
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(6L).toDF("id"), "id") // v3
    FwMaintenance.rollback(spark, dir, 2L)
    assert(readAll(dir).count() === 7L, "v3's delete rolled back")
    assert(readAll(dir).filter(col("id") === 6L).count() === 1L)
    assert(readAll(dir).filter(col("id") === 4L).count() === 0L,
      "v2's delete survives")
    FwMaintenance.rollback(spark, dir, 1L)
    assert(readAll(dir).count() === 8L, "all deletes rolled back")
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".fwdv")) === 0,
      "empty DVs are removed, not left as husks")
  }

  test("a DV'd table refuses streaming reads loudly") {
    val dir = freshTable(rows8)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(1L).toDF("id"), "id")
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.FixedWidth")
        .option("schema", spec).load(dir)
        .writeStream.format("memory").queryName("fwdv_stream")
        .start().processAllAvailable()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("deletion vectors")),
      msgs(e).mkString(" | "))
  }

  test("clone carries the DV pinned at the clone's v1: deleted rows " +
      "stay deleted in the clone's live and pinned reads") {
    val src = freshTable(rows8)
    FwMaintenance.deleteByKeysMoR(spark, src, schema,
      Seq(5L).toDF("id"), "id")
    val dst = Files.createTempDirectory("fwdvcl").toFile.getAbsolutePath
    new java.io.File(dst).delete()
    FwMaintenance.cloneTable(spark, src, dst)
    assert(readAll(dst).count() === 7L)
    assert(readAll(dst, Map("versionAsOf" -> "1")).count() === 7L)
    assert(readAll(dst).filter(col("id") === 5L).count() === 0L)
  }
}
