package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Non-destructive RESTORE and sv-aware compaction:
  *  - restore commits a new head equal to an old snapshot, keeping the
  *    whole history readable (rollback's history-preserving sibling);
  *  - compaction on a schema-evolved table groups per layout and
  *    stamps pre-evolution outputs, so the uniformity guard is gone
  *    for optimize.
  */
class FwRestoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,score:double:10"

  private def write(dir: String, rows: Seq[(Long, Double)],
      mode: String, sp: String = spec, parts: Int = 1): Unit =
    rows.toDF("id", "score").repartition(parts)
      .write.format("graft.sources.FixedWidth").option("schema", sp)
      .mode(mode).save(dir)

  private def ids(dir: String, sp: String = spec): Set[Long] = spark.read
    .format("graft.sources.FixedWidth").option("schema", sp).load(dir)
    .select("id").collect().map(_.getLong(0)).toSet

  test("restore after truncate: rows return, history intact, pins " +
      "keep reading") {
    val dir = Files.createTempDirectory("fwrs1").toFile.getAbsolutePath
    write(dir, Seq((1L, 1.0)), "overwrite")
    write(dir, Seq((2L, 2.0)), "append")
    FwMaintenance.truncateRetain(dir)
    assert(ids(dir) === Set.empty[Long])
    val r = FwMaintenance.restore(dir, 2L)
    assert(r.restoredVersion === 2L && r.newVersion === 4L)
    assert(ids(dir) === Set(1L, 2L))
    // the mistake is still in the history, pinnable
    val v3 = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).option("versionAsOf", "3").load(dir)
    assert(v3.count() === 0L)
    assert(FwVersions.currentMax(dir) === 4L)
    // appends continue normally on the restored head
    write(dir, Seq((3L, 3.0)), "append")
    assert(ids(dir) === Set(1L, 2L, 3L))
    // the history table names every operation (DESCRIBE HISTORY)
    // and carries per-commit metrics: added/removed files and records
    // per version, derived from consecutive manifest snapshots
    val hist = spark.read.format("graft.sources.FixedWidth")
      .option("history", "true").option("schema", spec).load(dir)
      .orderBy("version")
      .select("operation", "n_added_files", "n_removed_files",
        "n_added_records", "n_removed_records").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(hist === Seq(
      ("overwrite", 1L, 0L, 1L, 0L),
      ("append", 1L, 0L, 1L, 0L),
      ("truncate", 0L, 2L, 0L, 2L),
      ("restore", 2L, 0L, 2L, 0L),
      ("append", 1L, 0L, 1L, 0L)))
  }

  test("restore refuses when newer deletion vectors would keep rows " +
      "dead") {
    val dir = Files.createTempDirectory("fwrs2").toFile.getAbsolutePath
    write(dir, Seq((1L, 1.0), (2L, 2.0)), "overwrite")
    val schema = FixedWidth.parseSchema(spec)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(Tuple1(2L)).toDF("id"), "id")
    val e = intercept[IllegalArgumentException] {
      FwMaintenance.restore(dir, 1L)
    }
    assert(e.getMessage.contains("deletion-vector"))
  }

  test("optimize on an evolved table compacts per layout and stamps " +
      "the pre-evolution output") {
    val dir = Files.createTempDirectory("fwrs3").toFile.getAbsolutePath
    // two small v1-layout files
    write(dir, Seq((1L, 1.0)), "overwrite")
    write(dir, Seq((2L, 2.0)), "append")
    FwSchemaLog.addColumn(dir, spec, "bonus:long:6")
    val wide = s"$spec,bonus:long:6"
    // two small head-layout files
    Seq((3L, 3.0, 30L), (4L, 4.0, 40L)).toDF("id", "score", "bonus")
      .repartition(2)
      .write.format("graft.sources.FixedWidth").option("schema", wide)
      .mode("append").save(dir)
    val rep = FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20)
    assert(rep.groups === 2, "one group per layout")
    // the mixed table still reads exactly after compaction
    val rows = spark.read.format("graft.sources.FixedWidth")
      .option("schema", wide).load(dir).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(_.isNullAt(2)))
    assert(rows.drop(2).map(_.getLong(2)).toSeq === Seq(30L, 40L))
    // the compacted v1-layout output carries a stamp
    val log = FwSchemaLog.read(dir).get
    val compacted = FwFiles.list(dir)
      .filter(_.getName.startsWith("compact-")).map(_.getName)
    assert(compacted.length === 2)
    assert(compacted.count(n => log.svOf(n) == 1) === 1)
    assert(compacted.count(n => log.svOf(n) == 2) === 1)
  }
}
