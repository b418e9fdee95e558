package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Idempotent batch appends via txnAppId/txnVersion (the Delta `txn`
  * action on the FW manifest): a retried job version must not commit
  * twice, distinct apps are independent, and the idempotency records
  * survive a vacuum history trim.
  */
class FwTxnSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"

  private def write(dir: String, rows: Seq[(Long, String, Double)],
      mode: String, txn: Option[(String, Long)] = None): Unit = {
    val w = rows.toDF("id", "name", "score").repartition(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
    val wt = txn.fold(w) { case (app, v) =>
      w.option("txnAppId", app).option("txnVersion", v.toString)
    }
    wt.mode(mode).save(dir)
  }

  private def count(dir: String): Long = spark.read
    .format("graft.sources.FixedWidth").option("schema", spec)
    .load(dir).count()

  test("a retried txnVersion is swept, not re-committed; tmps are gone") {
    val dir = Files.createTempDirectory("fwtxn1").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app1", 1L)))
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app1", 1L)))
    assert(count(dir) === 2L)
    assert(FwVersions.currentMax(dir) === 2L)
    assert(FwVersions.txnHighWater(dir) === Map("app1" -> 1L))
    assert(!new java.io.File(dir).listFiles.exists(_.getName.endsWith(".tmp")))
  }

  test("a txnVersion BELOW the high-water mark is also a duplicate " +
      "(late replay of an old job)") {
    val dir = Files.createTempDirectory("fwtxn2").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite", Some(("app1", 5L)))
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app1", 3L)))
    assert(count(dir) === 1L)
    assert(FwVersions.currentMax(dir) === 1L)
  }

  test("distinct appIds do not collide") {
    val dir = Files.createTempDirectory("fwtxn3").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite", Some(("app1", 1L)))
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app2", 1L)))
    assert(count(dir) === 2L)
    assert(FwVersions.txnHighWater(dir)
      === Map("app1" -> 1L, "app2" -> 1L))
  }

  test("txn records survive a vacuum history trim") {
    val dir = Files.createTempDirectory("fwtxn4").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app1", 1L)))
    write(dir, Seq((3L, "c", 3.0)), "append", Some(("app1", 2L)))
    FwMaintenance.vacuum(spark, dir, retainLast = 2)
    // the trim kept versions 2..3; app1's high-water mark must persist
    assert(FwVersions.txnHighWater(dir) === Map("app1" -> 2L))
    write(dir, Seq((3L, "c", 3.0)), "append", Some(("app1", 2L)))
    assert(count(dir) === 3L)
  }

  test("a hard rollback past a txn commit forgets its record (the job " +
      "may legitimately rerun)") {
    val dir = Files.createTempDirectory("fwtxn5").toFile.getAbsolutePath
    write(dir, Seq((1L, "a", 1.0)), "overwrite")
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app1", 1L)))
    FwMaintenance.rollback(spark, dir, 1L)
    assert(FwVersions.txnHighWater(dir) === Map.empty[String, Long])
    write(dir, Seq((2L, "b", 2.0)), "append", Some(("app1", 1L)))
    assert(count(dir) === 2L)
  }

  test("txn options are rejected on partitioned layouts and when " +
      "only one of the pair is set") {
    val dir = Files.createTempDirectory("fwtxn6").toFile.getAbsolutePath
    val df = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val e1 = intercept[IllegalArgumentException] {
      df.write.format("graft.sources.FixedWidth").option("schema", spec)
        .option("partitionBy", "name")
        .option("txnAppId", "a").option("txnVersion", "1")
        .mode("append").save(dir)
    }
    assert(e1.getMessage.contains("flat-table"))
    val e2 = intercept[IllegalArgumentException] {
      df.write.format("graft.sources.FixedWidth").option("schema", spec)
        .option("txnAppId", "a").mode("append").save(dir)
    }
    assert(e2.getMessage.contains("together"))
  }
}
