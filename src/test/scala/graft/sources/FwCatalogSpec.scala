package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SQL-surface coverage of the fixed-width catalog plugin: DDL with
  * layout options, INSERT routed through the two-phase writer,
  * SELECT through the pruning/pushdown scan (incl. the metadata-only
  * COUNT(*)), RENAME and DROP semantics.
  */
class FwCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.fwcat", classOf[FwCatalog].getName)
    s
  }

  test("CREATE / INSERT / SELECT / DROP round-trip through plain SQL") {
    val dir = Files.createTempDirectory("fwcat").toFile.getAbsolutePath
    spark.sql(s"""CREATE TABLE fwcat.ns.people (id BIGINT, name STRING,
      score DOUBLE) OPTIONS (path '$dir', widths '6,10,12')""")
    spark.sql("""INSERT INTO fwcat.ns.people VALUES
      (1, 'ada', 3.5), (2, 'grace', -1.25), (3, 'edsger', 12.0)""")
    val got = spark.sql(
      "SELECT name FROM fwcat.ns.people WHERE score > 0 ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("ada", "edsger"))
    // pruned to the projected + order columns; score (filter-only,
    // fully pushed) must NOT be read back
    assert(FixedWidth.lastScanSummary.contains("read=[id,name]"),
      s"catalog SELECT lost pruning: ${FixedWidth.lastScanSummary}")
    assert(FixedWidth.lastScanSummary.contains("GreaterThan(score,"),
      s"catalog SELECT lost pushdown: ${FixedWidth.lastScanSummary}")

    // metadata-only count through SQL
    assert(spark.sql("SELECT count(*) FROM fwcat.ns.people")
      .collect()(0).getLong(0) === 3L)
    assert(FixedWidth.lastScanSummary.contains("pushed-agg=count(*)"),
      s"catalog count(*) did not push: ${FixedWidth.lastScanSummary}")

    // INSERT appends (second write does not truncate)
    spark.sql("INSERT INTO fwcat.ns.people VALUES (4, 'tony', 0.5)")
    assert(spark.table("fwcat.ns.people").count() === 4L)

    // INSERT OVERWRITE truncates
    spark.sql("INSERT OVERWRITE fwcat.ns.people VALUES (9, 'only', 1.0)")
    assert(spark.table("fwcat.ns.people").collect().map(_.getLong(0))
      .toSeq === Seq(9L))

    spark.sql("ALTER TABLE fwcat.ns.people RENAME TO fwcat.ns.humans")
    assert(spark.table("fwcat.ns.humans").count() === 1L)
    spark.sql("DROP TABLE fwcat.ns.humans")
    intercept[Exception] { spark.table("fwcat.ns.humans").count() }
    // external-table semantics: the data files survive DROP
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".fw")))
  }

  test("RENAME onto an existing table throws and keeps both tables") {
    val d1 = Files.createTempDirectory("fwcatr1").toFile.getAbsolutePath
    val d2 = Files.createTempDirectory("fwcatr2").toFile.getAbsolutePath
    spark.sql(s"""CREATE TABLE fwcat.ns.r1 (id BIGINT)
      OPTIONS (path '$d1', widths '4')""")
    spark.sql(s"""CREATE TABLE fwcat.ns.r2 (id BIGINT)
      OPTIONS (path '$d2', widths '4')""")
    intercept[Exception] {
      spark.sql("ALTER TABLE fwcat.ns.r1 RENAME TO fwcat.ns.r2")
    }
    // the failed rename must not have dropped the source's metadata
    assert(spark.table("fwcat.ns.r1").count() === 0L)
    assert(spark.table("fwcat.ns.r2").count() === 0L)
    spark.sql("DROP TABLE fwcat.ns.r1")
    spark.sql("DROP TABLE fwcat.ns.r2")
  }

  test("CREATE TABLE without layout options fails with a clear message") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE fwcat.ns.bad (id BIGINT) OPTIONS (widths '4')")
    }
    assert(e.getMessage.contains("requires OPTIONS (path"),
      s"unexpected: ${e.getMessage}")
  }

  test("PARTITIONED BY routes SQL inserts into hive dirs and prunes " +
      "SELECTs by directory") {
    val dir = Files.createTempDirectory("fwcatp").toFile.getAbsolutePath
    spark.sql(s"""CREATE TABLE fwcat.ns.events_p
      (id BIGINT, kind STRING, score DOUBLE)
      PARTITIONED BY (kind)
      OPTIONS (path '$dir', widths '6,8,12')""")
    spark.sql("""INSERT INTO fwcat.ns.events_p VALUES
      (1, 'click', 1.0), (2, 'view', 2.0), (3, 'click', 3.0),
      (4, 'buy', 4.0)""")
    val subs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(subs.toSeq === Seq("kind=buy", "kind=click", "kind=view"))
    val got = spark.sql(
      """SELECT id, score FROM fwcat.ns.events_p
        |WHERE kind = 'click' ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((1L, 1.0), (3L, 3.0)))
    assert(FixedWidth.lastPrunedPartitions === 2,
      "the view and buy directories must prune")
    spark.sql("DROP TABLE fwcat.ns.events_p")
    // multi-column / non-identity partitioning is refused clearly
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE fwcat.ns.bad_p (id BIGINT, k STRING)
        PARTITIONED BY (id, k) OPTIONS (path '$dir', widths '6,8')""")
    }
    assert(e.getMessage.contains("single partition column"),
      s"unexpected: ${e.getMessage}")
  }

  test("widths arity must match the column list") {
    val dir = Files.createTempDirectory("fwcat2").toFile.getAbsolutePath
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE fwcat.ns.bad2 (id BIGINT, name STRING)
        OPTIONS (path '$dir', widths '4')""")
    }
    assert(e.getMessage.contains("widths has 1 entries for 2 columns"),
      s"unexpected: ${e.getMessage}")
  }
}
