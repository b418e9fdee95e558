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

  test("streaming writes enforce CHECK constraints (the Delta " +
      "invariant discipline: every write path is gated)") {
    val dir = Files.createTempDirectory("fwckS").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("fwckSck").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    FwConstraints.add(spark, dir, spec, "pos_score", "score > 0")
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("id", "name", "score").writeStream
      .format("graft.sources.FixedWidth").option("schema", spec)
      .option("checkpointLocation", ckpt).start(dir)
    try {
      mem.addData((2L, "b", 2.0))
      q.processAllAvailable()
      assert(readAll(dir).count() === 2L)
      mem.addData((3L, "c", -1.0))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(exists(e, t => t.getMessage != null &&
        t.getMessage.contains("CHECK constraint 'pos_score'")))
    } finally q.stop()
    assert(readAll(dir).count() === 2L,
      "a violating epoch must publish nothing")
    assert(!new java.io.File(dir).listFiles
      .exists(_.getName.endsWith(".tmp")))
  }

  test("FwBatchWrite.abort tolerates null commit-message slots and " +
      "still sweeps the committed tasks' tmps") {
    val dir = Files.createTempDirectory("fwck8").toFile.getAbsolutePath
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
    val tmp = new java.io.File(dir, "part-00000-7.fw.tmp")
    Files.write(tmp.toPath, Array[Byte](48, 10))
    val w = new FwBatchWrite(schema, dir, truncateFirst = false)
    // Spark passes null for every task that never reached commit();
    // abort must sweep the tasks that DID, not MatchError on the rest
    w.abort(Array(FwCommitMessage(tmp.getAbsolutePath), null, null))
    assert(!tmp.exists, "committed task's tmp must be swept")
  }

  test("a mid-write task failure in a multi-task write leaves zero " +
      ".tmp files behind") {
    val dir = Files.createTempDirectory("fwck9").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    FwConstraints.add(spark, dir, spec, "pos_score", "score > 0")
    // 2 tasks: slice 0 all-valid and tiny (commits first), slice 1
    // fails on its LAST row, well after slice 0's commit message
    // landed -> abort sees [message, null] and must sweep the
    // committed task's tmps despite the null slot
    import org.apache.spark.sql.Row
    val schema = readAll(dir).schema
    val slow = (0 until 100000).map(i => Row(10L + i % 1000, "ok", 1.0)) :+
      Row(9999L, "bad", -1.0)
    val rdd = spark.sparkContext.parallelize(Seq(Row(2L, "b", 2.0)), 1)
      .union(spark.sparkContext.parallelize(slow, 1))
    val e = intercept[Exception] {
      spark.createDataFrame(rdd, schema).write
        .format("graft.sources.FixedWidth").option("schema", spec)
        .mode("append").save(dir)
    }
    assert(exists(e, _.getMessage.contains("CHECK constraint 'pos_score'")))
    assert(readAll(dir).count() === 1L)
    // a killed sibling task sweeps its own tmp asynchronously (Spark
    // returns the job failure without waiting for kill cleanup) — poll
    def tmps() = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".tmp"))
    val deadline = System.currentTimeMillis() + 10000
    while (tmps().nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(tmps().isEmpty,
      s"abort after task failure must sweep every committed tmp; " +
        s"leftover: ${tmps().map(_.getName).mkString(",")}")
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
