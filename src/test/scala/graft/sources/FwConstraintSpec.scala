package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CHECK constraints on the FW source: add validates existing rows,
  * writes enforce row-by-row with SQL CHECK null semantics, violations
  * abort the whole commit (no partial state), and the SQL procedure
  * surface drives the same machinery.
  */
class FwConstraintSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"

  private def write(dir: String, rows: Seq[(Long, String, Double)],
      mode: String): Unit =
    rows.toDF("id", "name", "score").repartition(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode(mode).save(dir)

  private def readAll(dir: String) = spark.read
    .format("graft.sources.FixedWidth").option("schema", spec).load(dir)

  test("a violating append aborts atomically; valid appends pass") {
    val dir = Files.createTempDirectory("fwck1").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    FwConstraints.add(spark, dir, spec, "pos_score", "score > 0")
    write(dir, Seq((2L, "b", 2.0)), "append") // satisfies
    val e = intercept[Exception] {
      write(dir, Seq((3L, "c", 3.0), (4L, "d", -1.0)), "append")
    }
    assert(exists(e, _.getMessage.contains("CHECK constraint 'pos_score'")))
    // the WHOLE failed commit is gone — including its valid row 3
    assert(readAll(dir).count() === 2L)
    assert(FwVersions.currentMax(dir) === 2L)
    assert(!new java.io.File(dir).listFiles
      .exists(_.getName.endsWith(".tmp")))
  }

  test("NULL passes (SQL CHECK semantics), explicit FALSE violates") {
    val dir = Files.createTempDirectory("fwck2").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    // a blank-padded string column reads back null; the constraint
    // references name so a null name must still be writable
    FwConstraints.add(spark, dir, spec, "name_len", "length(name) <= 6")
    write(dir, Seq((2L, null.asInstanceOf[String], 2.0)
      .asInstanceOf[(Long, String, Double)]), "append")
    assert(readAll(dir).count() === 2L)
  }

  test("adding a constraint the existing table violates is refused") {
    val dir = Files.createTempDirectory("fwck3").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0), (2L, "b", -2.0)), "overwrite")
    val e = intercept[IllegalArgumentException] {
      FwConstraints.add(spark, dir, spec, "pos_score", "score > 0")
    }
    assert(e.getMessage.contains("1 existing row(s) violate"))
    assert(FwConstraints.read(dir).isEmpty)
  }

  test("duplicate names are rejected; drop lifts enforcement") {
    val dir = Files.createTempDirectory("fwck4").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    FwConstraints.add(spark, dir, spec, "pos", "score > 0")
    intercept[IllegalArgumentException] {
      FwConstraints.add(spark, dir, spec, "pos", "id > 0")
    }
    FwConstraints.drop(dir, "pos")
    write(dir, Seq((2L, "b", -5.0)), "append")
    assert(readAll(dir).count() === 2L)
  }

  test("nondeterministic, subquery, and unknown-column expressions " +
      "are rejected at add time") {
    val dir = Files.createTempDirectory("fwck5").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    intercept[IllegalArgumentException] {
      FwConstraints.add(spark, dir, spec, "r", "rand() > 0.5")
    }
    intercept[Exception] {
      FwConstraints.add(spark, dir, spec, "q",
        "id IN (SELECT 1)")
    }
    intercept[Exception] {
      FwConstraints.add(spark, dir, spec, "u", "no_such_col > 0")
    }
    assert(FwConstraints.read(dir).isEmpty)
  }

  test("SQL surface: CALL fw.add_constraint gates INSERT INTO") {
    val dir = Files.createTempDirectory("fwck6").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwck", "graft.sources.FwCatalog")
    spark.sql("DROP TABLE IF EXISTS fwck.ns.t")
    spark.sql(s"""CREATE TABLE fwck.ns.t (id BIGINT, name STRING,
      score DOUBLE) OPTIONS (path '$dir', widths '4,6,10')""")
    spark.sql("INSERT INTO fwck.ns.t VALUES (1, 'a', 1.0)")
    val r = spark.sql(
      "CALL fwck.add_constraint('ns.t', 'pos', 'score > 0')").collect()
    assert(r.head.getString(0) === "pos")
    assert(r.head.getInt(1) === 1)
    spark.sql("INSERT INTO fwck.ns.t VALUES (2, 'b', 2.0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO fwck.ns.t VALUES (3, 'c', -3.0)")
    }
    assert(exists(e, _.getMessage.contains("CHECK constraint 'pos'")))
    assert(spark.table("fwck.ns.t").count() === 2L)
    spark.sql("CALL fwck.drop_constraint('ns.t', 'pos')")
    spark.sql("INSERT INTO fwck.ns.t VALUES (3, 'c', -3.0)")
    assert(spark.table("fwck.ns.t").count() === 3L)
  }

  test("row-level COW writes enforce constraints too: a violating " +
      "UPDATE aborts, table unchanged") {
    val dir = Files.createTempDirectory("fwck7").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.fwck2", "graft.sources.FwCatalog")
    spark.sql("DROP TABLE IF EXISTS fwck2.ns.t")
    spark.sql(s"""CREATE TABLE fwck2.ns.t (id BIGINT, name STRING,
      score DOUBLE) OPTIONS (path '$dir', widths '4,6,10')""")
    spark.sql("INSERT INTO fwck2.ns.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    FwConstraints.add(spark, dir, "id:long:4,name:string:6,score:double:10",
      "pos", "score > 0")
    spark.sql("UPDATE fwck2.ns.t SET score = score + 1 WHERE id = 1")
    val e = intercept[Exception] {
      spark.sql("UPDATE fwck2.ns.t SET score = -9 WHERE id = 2")
    }
    assert(exists(e, _.getMessage.contains("CHECK constraint 'pos'")))
    val rows = spark.table("fwck2.ns.t").orderBy("id").collect()
    assert(rows.map(_.getDouble(2)).toSeq === Seq(2.0, 2.0),
      "failed UPDATE must leave the table untouched")
  }

  /** Any throwable in the cause chain matching `p`. */
  private def exists(t: Throwable, p: Throwable => Boolean): Boolean = {
    var cur = t
    while (cur != null) {
      if (p(cur)) return true
      cur = cur.getCause
    }
    false
  }
}
