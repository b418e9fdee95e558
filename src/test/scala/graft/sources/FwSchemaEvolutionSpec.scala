package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only ADD COLUMN on the FW source: old files parse at their
  * own prefix layout with NULL for the missing trailing columns, new
  * files carry the head layout, counts and filters stay exact over the
  * mix, stale-schema reads/writes are refused, head-slicing ops guard
  * until the table is uniform again, and a COW pass upgrades old files
  * in place.
  */
class FwSchemaEvolutionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val specV1 = "id:long:4,score:double:10"
  private val specV2 = "id:long:4,score:double:10,bonus:long:6"

  private def write(dir: String, spec: String, df: org.apache.spark.sql.DataFrame,
      mode: String): Unit =
    df.repartition(1).write.format("graft.sources.FixedWidth")
      .option("schema", spec).mode(mode).save(dir)

  private def read(dir: String, spec: String) = spark.read
    .format("graft.sources.FixedWidth").option("schema", spec).load(dir)

  test("old files read NULL for the added column; the mix counts and " +
      "filters exactly") {
    val dir = Files.createTempDirectory("fwse1").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5), (2L, 2.5)).toDF("id", "score"),
      "overwrite")
    FwSchemaLog.addColumn(dir, specV1, "bonus:long:6")
    write(dir, specV2,
      Seq((3L, 3.5, 30L), (4L, 4.5, 40L)).toDF("id", "score", "bonus"),
      "append")
    val all = read(dir, specV2).orderBy("id").collect()
    assert(all.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(all.take(2).forall(_.isNullAt(2)), "old rows: bonus NULL")
    assert(all.drop(2).map(_.getLong(2)).toSeq === Seq(30L, 40L))
    assert(read(dir, specV2).count() === 4L)
    // SQL null semantics over the mixed layout
    assert(read(dir, specV2).filter(col("bonus") > 0).count() === 2L)
    assert(read(dir, specV2).filter(col("bonus").isNull).count() === 2L)
    // prefix columns still parse and filter across both layouts
    assert(read(dir, specV2).filter(col("score") > 2.0).count() === 3L)
  }

  test("stale-schema reads and writes are refused after evolution") {
    val dir = Files.createTempDirectory("fwse2").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5)).toDF("id", "score"), "overwrite")
    FwSchemaLog.addColumn(dir, specV1, "bonus:long:6")
    val er = intercept[Exception] { read(dir, specV1).count() }
    assert(chainHas(er, "must carry the head schema"))
    val ew = intercept[Exception] {
      write(dir, specV1, Seq((2L, 2.5)).toDF("id", "score"), "append")
    }
    assert(chainHas(ew, "must carry the head schema"))
  }

  test("pre-evolution snapshots read through versionAsOf with NULLs") {
    val dir = Files.createTempDirectory("fwse3").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5)).toDF("id", "score"), "overwrite")
    FwSchemaLog.addColumn(dir, specV1, "bonus:long:6")
    write(dir, specV2, Seq((2L, 2.5, 20L)).toDF("id", "score", "bonus"),
      "append")
    val v1 = spark.read.format("graft.sources.FixedWidth")
      .option("schema", specV2).option("versionAsOf", "1").load(dir)
      .collect()
    assert(v1.map(_.getLong(0)).toSeq === Seq(1L))
    assert(v1.head.isNullAt(2))
  }

  test("head-slicing ops guard on non-uniform tables; a COW UPDATE " +
      "upgrades every live file and lifts the guard") {
    val dir = Files.createTempDirectory("fwse4").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwse", "graft.sources.FwCatalog")
    spark.sql("DROP TABLE IF EXISTS fwse.ns.t")
    spark.sql(s"""CREATE TABLE fwse.ns.t (id BIGINT, score DOUBLE)
      OPTIONS (path '$dir', widths '4,10')""")
    spark.sql("INSERT INTO fwse.ns.t VALUES (1, 1.5), (2, 2.5)")
    // SQL surface: ALTER TABLE ADD COLUMN, width in the comment
    spark.sql("ALTER TABLE fwse.ns.t ADD COLUMN bonus BIGINT " +
      "COMMENT 'width=6'")
    spark.sql("INSERT INTO fwse.ns.t VALUES (3, 3.5, 30)")
    // compaction is sv-aware (groups per layout) — it runs fine on the
    // mixed table; ordinal-matching ops still guard
    FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20)
    val eo = intercept[Exception] {
      FwMaintenance.deleteByKeysMoR(spark, dir,
        FixedWidth.parseSchema("id:long:4,score:double:10,bonus:long:6"),
        Seq(Tuple1(1L)).toDF("id"), "id")
    }
    assert(chainHas(eo, "older schema versions"))
    // identity COW rewrite: every live file lands at the head layout
    spark.sql("UPDATE fwse.ns.t SET score = score WHERE id >= 0")
    val rows = spark.table("fwse.ns.t").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.take(2).forall(_.isNullAt(2)))
    assert(rows(2).getLong(2) === 30L)
    // uniform again: compaction may proceed
    FwMaintenance.optimize(spark, dir, targetBytes = 1L << 20)
    assert(spark.table("fwse.ns.t").count() === 3L)
  }

  test("a second evolution stacks; three layouts coexist") {
    val dir = Files.createTempDirectory("fwse5").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5)).toDF("id", "score"), "overwrite")
    FwSchemaLog.addColumn(dir, specV1, "bonus:long:6")
    write(dir, specV2, Seq((2L, 2.5, 20L)).toDF("id", "score", "bonus"),
      "append")
    FwSchemaLog.addColumn(dir, specV2, "tag:string:5")
    val specV3 = s"$specV2,tag:string:5"
    write(dir, specV3,
      Seq((3L, 3.5, 30L, "x")).toDF("id", "score", "bonus", "tag"),
      "append")
    val rows = read(dir, specV3).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(rows(1).getLong(2) === 20L && rows(1).isNullAt(3))
    assert(rows(2).getLong(2) === 30L && rows(2).getString(3) === "x")
  }

  test("RENAME/DROP COLUMN (the mapping layer) stay flat-table; ADD " +
      "COLUMN on a bucketed layout works") {
    val dir = Files.createTempDirectory("fwse6").toFile.getAbsolutePath
    Seq((1L, 1.5)).toDF("id", "score").repartition(1)
      .write.format("graft.sources.FixedWidth")
      .option("schema", specV1).option("bucketBy", "id")
      .option("buckets", "2").mode("overwrite").save(dir)
    // ADD COLUMN evolves k=v layouts since round 12 (stamp pass walks
    // the dirs); the MAPPING layer is still flat-only — its sidecar
    // _phys indices would be ambiguous over pcol-less data records
    FwSchemaLog.addColumn(dir, specV1, "bonus:long:6")
    val e = intercept[IllegalArgumentException] {
      FwSchemaLog.renameColumn(dir, "score", "pts")
    }
    assert(e.getMessage.contains("flat-table"))
    val e2 = intercept[IllegalArgumentException] {
      FwSchemaLog.dropColumn(dir, "score")
    }
    assert(e2.getMessage.contains("flat-table"))
  }

  test("multi-column ALTER is atomic: all columns land, and a bad " +
      "column rejects the whole ALTER with no half-evolved log") {
    val dir = Files.createTempDirectory("fwse7").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwse7", "graft.sources.FwCatalog")
    spark.sql("DROP TABLE IF EXISTS fwse7.ns.t")
    spark.sql(s"""CREATE TABLE fwse7.ns.t (id BIGINT, score DOUBLE)
      OPTIONS (path '$dir', widths '4,10')""")
    spark.sql("INSERT INTO fwse7.ns.t VALUES (1, 1.5)")
    // both columns in ONE statement: the second must see the first's
    // spec as head, not the pre-ALTER snapshot
    spark.sql("ALTER TABLE fwse7.ns.t ADD COLUMNS (" +
      "bonus BIGINT COMMENT 'width=6', tag STRING COMMENT 'width=5')")
    spark.sql("INSERT INTO fwse7.ns.t VALUES (2, 2.5, 20, 'x')")
    val rows = spark.table("fwse7.ns.t").orderBy("id").collect()
    assert(rows.length === 2 && rows(1).getLong(2) === 20L
      && rows(1).getString(3) === "x")
    // a width-less column rejects the WHOLE alter: the valid column
    // before it must not have been applied
    val logBefore = FwSchemaLog.read(dir).map(_.specs.length)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE fwse7.ns.t ADD COLUMNS (" +
        "ok BIGINT COMMENT 'width=6', bad BIGINT)")
    }
    assert(chainHas(e, "needs its layout width"))
    assert(FwSchemaLog.read(dir).map(_.specs.length) === logBefore,
      "a rejected multi-column ALTER must leave the schema log alone")
    spark.sql("INSERT INTO fwse7.ns.t VALUES (3, 3.5, 30, 'y')")
    assert(spark.table("fwse7.ns.t").count() === 3L)
  }

  test("RENAME COLUMN is metadata-only: reads resolve the new name, " +
      "stale reads refuse, appends keep working") {
    val dir = Files.createTempDirectory("fwse8").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5), (2L, 2.5)).toDF("id", "score"),
      "overwrite")
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fw"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSeq
    FwSchemaLog.ensureLog(dir, specV1)
    FwSchemaLog.renameColumn(dir, "score", "pts")
    val specR = "id:long:4,pts:double:10"
    assert(new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".fw"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSeq ===
      before, "rename must not touch a data file")
    val rows = read(dir, specR).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 1.5), (2L, 2.5)), "values survive under the new name")
    val stale = intercept[Exception] { read(dir, specV1).count() }
    assert(chainHas(stale, "declare its current schema"))
    write(dir, specR, Seq((3L, 3.5)).toDF("id", "pts"), "append")
    assert(read(dir, specR).count() === 3L)
    assert(read(dir, specR).filter(col("pts") > 3.0).count() === 1L)
  }

  test("DROP COLUMN hides the field (bytes stay); appends render it " +
      "NULL; re-ADD is a fresh column — old values never resurface") {
    val dir = Files.createTempDirectory("fwse9").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5), (2L, 2.5)).toDF("id", "score"),
      "overwrite")
    FwSchemaLog.ensureLog(dir, specV1)
    FwSchemaLog.dropColumn(dir, "score")
    val specD = "id:long:4"
    val rows = read(dir, specD).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows.head.length === 1, "dropped column is gone from reads")
    // appends write the physical hole as NULL and read back fine
    write(dir, specD, Seq(Tuple1(3L)).toDF("id"), "append")
    assert(read(dir, specD).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // re-ADD of the same name: a NEW physical field, all NULL
    FwSchemaLog.addColumn(dir, specD, "score:double:8")
    val specRe = "id:long:4,score:double:8"
    val re = read(dir, specRe).orderBy("id").collect()
    assert(re.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(re.forall(_.isNullAt(1)),
      "re-added column must NOT resurrect dropped values")
    write(dir, specRe, Seq((4L, 44.0)).toDF("id", "score"), "append")
    val re2 = read(dir, specRe).orderBy("id").collect()
    assert(re2.count(_.isNullAt(1)) === 3 && re2.last.getDouble(1) === 44.0)
    // min/max over the mix is exact (agg pushdown declined, row scan)
    assert(read(dir, specRe).agg(
      org.apache.spark.sql.functions.min(col("score"))).head.getDouble(0)
      === 44.0)
  }

  test("FwMaintenance merge and deleteByKeys translate logical rows " +
      "to the physicalized layout on a mapped table") {
    val dir = Files.createTempDirectory("fwse12").toFile.getAbsolutePath
    val specWide = "id:long:4,tag:string:5,score:double:10"
    write(dir, specWide, Seq((1L, "a", 1.5), (2L, "b", 2.5),
      (3L, "c", 3.5)).toDF("id", "tag", "score"), "overwrite")
    FwSchemaLog.ensureLog(dir, specWide)
    FwSchemaLog.renameColumn(dir, "score", "pts")
    FwSchemaLog.dropColumn(dir, "tag")
    // logical = (id, pts); physical keeps the dropped tag hole
    val specM = "id:long:4,pts:double:10"
    val schemaM = FixedWidth.parseSchema(specM)
    // merge on the mapped table: update key 2, insert key 9 — the
    // replacement rows pad the dropped field's physical hole NULL
    FwMaintenance.merge(spark, dir, schemaM,
      Seq((2L, 22.0), (9L, 99.0)).toDF("id", "pts"), "id")
    val rows = read(dir, specM).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((1L, 1.5), (2L, 22.0), (3L, 3.5), (9L, 99.0)),
      "merge updates/inserts land under the mapping")
    // stale logical schema refuses
    val e = intercept[Exception] {
      FwMaintenance.merge(spark, dir, FixedWidth.parseSchema(specWide),
        Seq((1L, "x", 0.0)).toDF("id", "tag", "score"), "id")
    }
    assert(chainHas(e, "declare the table's current schema"))
    // COW key delete on the mapped table
    FwMaintenance.deleteByKeys(spark, dir, schemaM,
      Seq(Tuple1(3L)).toDF("id"), "id")
    assert(read(dir, specM).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 9L))
  }

  test("time travel reads pre-rename/drop snapshots under the CURRENT " +
      "logical schema") {
    val dir = Files.createTempDirectory("fwse10").toFile.getAbsolutePath
    write(dir, specV1, Seq((1L, 1.5)).toDF("id", "score"), "overwrite")
    write(dir, specV1, Seq((2L, 2.5)).toDF("id", "score"), "append")
    FwSchemaLog.ensureLog(dir, specV1)
    FwSchemaLog.renameColumn(dir, "score", "pts")
    FwSchemaLog.dropColumn(dir, "pts")
    val specD = "id:long:4"
    val v1 = spark.read.format("graft.sources.FixedWidth")
      .option("schema", specD).option("versionAsOf", "1").load(dir)
      .collect()
    assert(v1.map(_.getLong(0)).toSeq === Seq(1L) && v1.head.length === 1,
      "the v1 snapshot reads through the current mapping")
    assert(spark.read.format("graft.sources.FixedWidth")
      .option("schema", specD).option("versionAsOf", "2").load(dir)
      .count() === 2L)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN through the " +
      "catalog; not-mapping-aware ops refuse loudly") {
    val dir = Files.createTempDirectory("fwse11").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwse11",
      classOf[FwCatalog].getName)
    spark.sql(s"""CREATE TABLE fwse11.ns.t (id BIGINT, score DOUBLE)
      OPTIONS (path '$dir', widths '4,10')""")
    spark.sql("INSERT INTO fwse11.ns.t VALUES (1, 1.5), (2, 2.5)")
    spark.sql("ALTER TABLE fwse11.ns.t RENAME COLUMN score TO pts")
    assert(spark.sql("SELECT pts FROM fwse11.ns.t ORDER BY id")
      .collect().map(_.getDouble(0)).toSeq === Seq(1.5, 2.5))
    spark.sql("INSERT INTO fwse11.ns.t VALUES (3, 3.5)")
    assert(spark.table("fwse11.ns.t").count() === 3L)
    spark.sql("ALTER TABLE fwse11.ns.t DROP COLUMN pts")
    assert(spark.table("fwse11.ns.t").columns.toSeq === Seq("id"))
    assert(spark.sql("SELECT id FROM fwse11.ns.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // the change feed is mapping-aware: the whole history reads at
    // the CURRENT logical schema
    def cdf() = spark.read.format("graft.sources.FixedWidth")
      .option("schema", "id:long:4")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(dir)
      .select("_change_type", "_commit_version", "id")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(cdf() === Seq(("insert", 1L, 1L), ("insert", 1L, 2L),
      ("insert", 2L, 3L)))
    // keyed MoR deletes are mapping-aware (ordinal scan runs on the
    // physicalized layout) and stream as CDF deletes
    spark.sql("DELETE FROM fwse11.ns.t WHERE id = 2")
    assert(spark.sql("SELECT id FROM fwse11.ns.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(cdf().contains(("delete", 3L, 2L)))
    // row-level COW UPDATE is mapping-aware too: the rewrite reads at
    // the physicalized layout and pads replacement rows back out to it
    spark.sql("UPDATE fwse11.ns.t SET id = 9 WHERE id = 1")
    assert(spark.sql("SELECT id FROM fwse11.ns.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L, 9L))
    // the COW commit's eagerly-materialized change data (stored at the
    // LOGICAL layout) streams through the mapped change feed
    assert(cdf().filter(_._2 == 4L).sorted === Seq(
      ("delete", 4L, 1L), ("insert", 4L, 9L)))
    // ... and so is the clustered rewrite
    val rz = spark.sql("CALL fwse11.optimize(tbl => 'ns.t', " +
      "target_bytes => 1024, zorder_by => 'id')").collect()(0)
    assert(rz.getInt(2) >= 1)
    assert(spark.sql("SELECT id FROM fwse11.ns.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L, 9L),
      "clustering must not change the rows of a mapped table")
    // bin-pack compaction stays available (physical-level, safe)
    val r = spark.sql(
      "CALL fwse11.optimize(tbl => 'ns.t', target_bytes => 1048576)")
      .collect()(0)
    assert(r.getInt(2) <= r.getInt(1))
    assert(spark.table("fwse11.ns.t").count() === 2L,
      "the MoR delete and UPDATE above hold through compaction")
  }

  test("an ALTER batch fully applies or fully fails: a bad LATER " +
      "change rejects before any log mutation") {
    val dir = Files.createTempDirectory("fwse15").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwse15",
      classOf[FwCatalog].getName)
    spark.sql(s"""CREATE TABLE fwse15.ns.t (id BIGINT, score DOUBLE)
      OPTIONS (path '$dir', widths '4,10')""")
    spark.sql("INSERT INTO fwse15.ns.t VALUES (1, 1.5)")
    // second column uses the reserved prefix: the whole batch must
    // reject with the FIRST column not added either
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE fwse15.ns.t ADD COLUMNS (" +
        "x BIGINT COMMENT 'width=4', " +
        "__fw_dropped_bad BIGINT COMMENT 'width=4')")
    }
    assert(chainHas(e, "reserved name prefix"))
    assert(spark.table("fwse15.ns.t").columns.toSeq ===
      Seq("id", "score"), "no half-applied batch")
    assert(FwSchemaLog.read(dir).forall(_.specs.length == 1),
      "the schema log must not carry the batch's first column")
    // a later width-less ADD rejects the batch the same way
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE fwse15.ns.t ADD COLUMNS (" +
        "y BIGINT COMMENT 'width=4', z BIGINT)")
    }
    assert(chainHas(e2, "width"))
    assert(spark.table("fwse15.ns.t").columns.toSeq === Seq("id", "score"))
    assert(FwSchemaLog.read(dir).forall(_.specs.length == 1))
  }

  test("zone maps survive a rename chain that reuses a retired name: " +
      "stats resolve by physical slot, never by stale name") {
    val dir = Files.createTempDirectory("fwse13").toFile.getAbsolutePath
    val spec0 = "a:long:4,c:long:4"
    // file 1: a in [1,3], c in [101,103]; file 2: a in [11,13], c in
    // [111,113]
    write(dir, spec0, Seq((1L, 101L), (2L, 102L), (3L, 103L))
      .toDF("a", "c"), "overwrite")
    write(dir, spec0, Seq((11L, 111L), (12L, 112L), (13L, 113L))
      .toDF("a", "c"), "append")
    FwSchemaLog.ensureLog(dir, spec0)
    // retire 'a', then REUSE it for the column that was 'c'
    FwSchemaLog.renameColumn(dir, "a", "b")
    FwSchemaLog.renameColumn(dir, "c", "a")
    val spec1 = "b:long:4,a:long:4"
    // a name-keyed lookup would read old-'a's envelope [1,3]/[11,13]
    // for the filter on new-'a' and prune BOTH files for value 102 —
    // silently losing the matching row
    val hit = read(dir, spec1).filter(col("a") === 102L).collect()
    assert(hit.map(_.getLong(0)).toSeq === Seq(2L),
      "the rename chain must not lose rows to stale-name pruning")
    // ... and pruning still WORKS through the mapping: file 2's
    // re-keyed envelope for new-'a' is [111,113], excluded exactly
    assert(FixedWidth.lastSkippedFiles === 1,
      "the re-keyed envelope should prune the non-matching file")
    // a legacy sidecar (no _phys) on a mapped table never prunes —
    // conservative, still correct
    val f1 = FwFiles.list(dir).minBy(_.getName)
    FwStats.write(FwStats.sidecarFor(f1.getPath),
      Map("a" -> FwIntStats(1L, 3L), "c" -> FwIntStats(101L, 103L)),
      f1.length())
    val hit2 = read(dir, spec1).filter(col("a") === 102L).collect()
    assert(hit2.map(_.getLong(1)).toSeq === Seq(102L),
      "a legacy name-keyed sidecar must not prune under mapping")
  }

  test("metadata-only MIN/MAX answers on a mapped table through the " +
      "physical-slot re-key; legacy sidecars decline it") {
    import org.apache.spark.sql.functions.{max, min}
    val dir = Files.createTempDirectory("fwse14").toFile.getAbsolutePath
    val spec0 = "id:long:4,score:long:6"
    write(dir, spec0, Seq((1L, 10L), (2L, 20L)).toDF("id", "score"),
      "overwrite")
    write(dir, spec0, Seq((3L, 30L)).toDF("id", "score"), "append")
    FwSchemaLog.ensureLog(dir, spec0)
    FwSchemaLog.renameColumn(dir, "score", "pts")
    val spec1 = "id:long:4,pts:long:6"
    val df = read(dir, spec1).agg(min(col("pts")).as("lo"),
      max(col("pts")).as("hi"))
    assert(df.collect().head.toSeq === Seq(10L, 30L))
    assert(FixedWidth.lastScanSummary.contains("pushed-agg"),
      s"renamed MIN/MAX should stay metadata-only: " +
        FixedWidth.lastScanSummary)
    // rename chain reusing the retired name: MIN/MAX of new-'score'
    // (physically the old 'id') must answer from ID'S envelope
    FwSchemaLog.renameColumn(dir, "id", "key")
    FwSchemaLog.renameColumn(dir, "pts", "score")
    val spec2 = "key:long:4,score:long:6"
    assert(read(dir, spec2).agg(min(col("key")), max(col("score")))
      .collect().head.toSeq === Seq(1L, 30L))
    assert(FixedWidth.lastScanSummary.contains("pushed-agg"))
    // a legacy (no _phys) sidecar voids the metadata answer: the row
    // scan takes over, result stays exact
    val f1 = FwFiles.list(dir).minBy(_.getName)
    FwStats.write(FwStats.sidecarFor(f1.getPath),
      Map("id" -> FwIntStats(1L, 2L), "score" -> FwIntStats(10L, 20L)),
      f1.length())
    assert(read(dir, spec2).agg(max(col("score"))).collect()
      .head.getLong(0) === 30L)
    assert(!FixedWidth.lastScanSummary.contains("pushed-agg"),
      "a legacy sidecar under mapping must decline the pushdown")
  }

  test("REORG APPLY PURGE physically reclaims dropped columns: live " +
      "bytes shrink, rows hold, old pins read, purged data is GONE " +
      "from every live file") {
    import org.apache.spark.sql.functions.max
    val dir = Files.createTempDirectory("fwse16").toFile.getAbsolutePath
    val spec0 = "id:long:4,ssn:string:11,score:double:10"
    write(dir, spec0, Seq((1L, "111-22-3333", 1.5),
      (2L, "444-55-6666", 2.5)).toDF("id", "ssn", "score"), "overwrite")
    write(dir, spec0, Seq((3L, "777-88-9999", 3.5))
      .toDF("id", "ssn", "score"), "append")
    FwSchemaLog.ensureLog(dir, spec0)
    FwSchemaLog.renameColumn(dir, "score", "pts")
    FwSchemaLog.dropColumn(dir, "ssn")
    val specL = "id:long:4,pts:double:10"
    val bytesBefore = FwFiles.list(dir).map(_.length()).sum
    val r = FwMaintenance.reorg(spark, dir, FixedWidth.parseSchema(specL))
    assert(r.purgedFields === 1 && r.version.isDefined)
    assert(r.bytesAfter < r.bytesBefore,
      s"purge must shrink live bytes: ${r.bytesAfter} vs ${r.bytesBefore}")
    assert(r.bytesBefore === bytesBefore)
    // rows identical under the logical schema
    val rows = read(dir, specL).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(rows === Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    // the purged PII is gone from EVERY live file's bytes
    FwFiles.list(dir).foreach { f =>
      val bytes = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(!bytes.contains("-"), // all three SSNs carry dashes
        s"live file ${f.getName} still carries purged bytes")
    }
    // mapping collapsed to identity; a post-reorg append works at the
    // purged layout and the metadata MIN/MAX answers again
    assert(FwSchemaLog.read(dir).exists(l =>
      !l.hasMapping && l.eraStart === l.head))
    write(dir, specL, Seq((4L, 4.5)).toDF("id", "pts"), "append")
    assert(read(dir, specL).agg(max(col("pts"))).head.getDouble(0) === 4.5)
    assert(FixedWidth.lastScanSummary.contains("pushed-agg"),
      s"post-reorg MIN/MAX should be metadata-only: " +
        FixedWidth.lastScanSummary)
    // pre-reorg pins read the RETAINED originals through the era
    // translation, under the CURRENT logical schema — and filters on
    // translated positions stay exact
    val v2 = spark.read.format("graft.sources.FixedWidth")
      .option("schema", specL).option("versionAsOf", "2").load(dir)
    assert(v2.orderBy("id").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq ===
      Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)),
      "pre-reorg pins must read retained files at their recorded layout")
    assert(v2.filter(col("pts") > 2.0).count() === 2L)
    val v1 = spark.read.format("graft.sources.FixedWidth")
      .option("schema", specL).option("versionAsOf", "1").load(dir)
    assert(v1.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // a reorg on an unmapped table refuses (nothing to purge)
    val e = intercept[Exception] {
      FwMaintenance.reorg(spark, dir, FixedWidth.parseSchema(specL))
    }
    assert(chainHas(e, "no column mapping"))
    // and the CDF still replays the WHOLE history — pre-reorg appends
    // through the era translation, the reorg commit itself as zero
    // rows (rows identical, like compaction)
    val cdf = spark.read.format("graft.sources.FixedWidth")
      .option("schema", specL).option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir)
      .select("_change_type", "_commit_version", "id", "pts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(cdf === Seq(("insert", 1L, 1L), ("insert", 1L, 2L),
      ("insert", 2L, 3L), ("insert", 4L, 4L)),
      s"CDF across the reorg must be exactly the inserts: $cdf")
  }

  test("ADD COLUMN evolves a hive-partitioned layout: old files stamp " +
      "under their partition dir and parse at their own width; " +
      "pruning and the pcol injection hold over the mix") {
    val dir = Files.createTempDirectory("fwse17").toFile.getAbsolutePath
    val spec1 = "id:long:4,nk:int:3,score:double:10"
    val spec2 = spec1 + ",bonus:long:6"
    Seq((1L, 1, 1.5), (2L, 1, 2.5), (3L, 2, 3.5))
      .toDF("id", "nk", "score")
      .write.format("graft.sources.FixedWidth")
      .option("schema", spec1).option("partitionBy", "nk")
      .mode("overwrite").save(dir)
    FwSchemaLog.addColumn(dir, spec1, "bonus:long:6")
    // the stamp pass walked the k=v dirs: every old file is recorded
    // under its RELATIVE key
    val log = FwSchemaLog.read(dir).get
    assert(log.fileSv.keySet.forall(_.contains("/")) &&
      log.fileSv.nonEmpty, s"relative stamps expected: ${log.fileSv}")
    // appends land at the widened head, in their partition dirs
    Seq((4L, 2, 4.5, 40L), (5L, 3, 5.5, 50L))
      .toDF("id", "nk", "score", "bonus")
      .write.format("graft.sources.FixedWidth")
      .option("schema", spec2).option("partitionBy", "nk")
      .mode("append").save(dir)
    def rd = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec2).option("partitionBy", "nk").load(dir)
    val all = rd.orderBy("id").collect()
    assert(all.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(all.take(3).forall(_.isNullAt(3)), "old rows: bonus NULL")
    assert(all.drop(3).map(_.getLong(3)).toSeq === Seq(40L, 50L))
    // filters over the mix stay exact, including on the new column
    assert(rd.filter(col("bonus") > 0).count() === 2L)
    assert(rd.filter(col("bonus").isNull).count() === 3L)
    assert(rd.filter(col("score") > 2.0).count() === 4L)
    // partition pruning still prunes over the evolved mix
    assert(rd.filter(col("nk") === 2).count() === 2L)
    assert(FixedWidth.lastPrunedPartitions === 2,
      "nk=1 and nk=3 should be pruned")
    // a stale declared schema refuses loudly
    val e = intercept[Exception] {
      spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec1).option("partitionBy", "nk").load(dir)
        .count()
    }
    assert(chainHas(e, "must carry the head schema"))
    // the grouped metadata aggregate declines on the mixed layout and
    // the row scan stays exact
    assert(rd.groupBy("nk").count().orderBy("nk").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 2L), (2, 2L), (3, 1L)))
  }

  test("ADD COLUMN evolves a bucketed layout the same way") {
    val dir = Files.createTempDirectory("fwse18").toFile.getAbsolutePath
    val spec1 = "id:long:4,score:double:10"
    val spec2 = spec1 + ",bonus:long:6"
    Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)).toDF("id", "score")
      .write.format("graft.sources.FixedWidth")
      .option("schema", spec1).option("bucketBy", "id")
      .option("buckets", "4").mode("overwrite").save(dir)
    FwSchemaLog.addColumn(dir, spec1, "bonus:long:6")
    Seq((4L, 4.5, 40L)).toDF("id", "score", "bonus")
      .write.format("graft.sources.FixedWidth")
      .option("schema", spec2).option("bucketBy", "id")
      .option("buckets", "4").mode("append").save(dir)
    def rd = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec2).option("bucketBy", "id")
      .option("buckets", "4").load(dir)
    val all = rd.orderBy("id").collect()
    assert(all.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(all.take(3).forall(_.isNullAt(2)))
    assert(all.last.getLong(2) === 40L)
    // bucket confinement still routes an equality probe over the mix
    assert(rd.filter(col("id") === 4L).count() === 1L)
    assert(rd.filter(col("bonus").isNull).count() === 3L)
  }

  private def chainHas(t: Throwable, s: String): Boolean = {
    var cur = t
    while (cur != null) {
      if (cur.getMessage != null && cur.getMessage.contains(s)) return true
      cur = cur.getCause
    }
    false
  }
}
