package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Row-grain change data feed between snapshot versions: updates emit
  * delete(pre-image) + insert(post-image), appends emit inserts only,
  * merge-on-read deletes inside shared files trigger the full-diff
  * fallback, and the CDF algebra `from ⊎ inserts ∖ deletes = to` holds
  * across every version pair of a mixed history.
  */
class FwChangeFeedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"
  private val schema = FixedWidth.parseSchema(spec)

  private def freshTable(rows: Seq[(Long, String, Double)],
      parts: Int = 2): String = {
    val dir = Files.createTempDirectory("fwcdf").toFile.getAbsolutePath
    rows.toDF("id", "name", "score").repartitionByRange(parts, col("id"))
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("overwrite").save(dir)
    dir
  }

  private def cdf(dir: String, from: Long, to: Long) =
    FwChangeFeed.changesBetween(spark, dir, spec, from, to)

  private def changes(dir: String, from: Long, to: Long)
      : Set[(String, Long, String)] =
    cdf(dir, from, to).select("_change_type", "id", "name")
      .as[(String, Long, String)].collect().toSet

  private def rd(dir: String, v: Long) =
    spark.read.format("graft.sources.FixedWidth").option("schema", spec)
      .option("versionAsOf", v).load(dir)

  test("a COW update is delete(pre-image) + insert(post-image); " +
      "untouched rows never appear") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)), parts = 1)
    FwMaintenance.merge(spark, dir, schema,
      Seq((2L, "B", 20.0)).toDF("id", "name", "score"), "id") // v2
    assert(changes(dir, 1L, 2L) === Set(
      ("delete", 2L, "b"), ("insert", 2L, "B")))
  }

  test("an append emits inserts only; a COW key delete emits deletes " +
      "only; the algebra holds across every version pair") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    Seq((3L, "c", 3.0)).toDF("id", "name", "score").coalesce(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("append").save(dir) // v2
    FwMaintenance.deleteByKeys(spark, dir, schema,
      Seq(1L).toDF("id"), "id") // v3 (COW)
    assert(changes(dir, 1L, 2L) === Set(("insert", 3L, "c")))
    assert(changes(dir, 2L, 3L) === Set(("delete", 1L, "a")))
    assert(changes(dir, 1L, 3L) === Set(
      ("insert", 3L, "c"), ("delete", 1L, "a")))
    // v_from ⊎ inserts ∖ deletes = v_to, every pair
    for ((f, t) <- Seq((1L, 2L), (2L, 3L), (1L, 3L))) {
      val feed = cdf(dir, f, t).persist()
      val ins = feed.filter(col("_change_type") === "insert")
        .drop("_change_type")
      val del = feed.filter(col("_change_type") === "delete")
        .drop("_change_type")
      val replayed = rd(dir, f).unionAll(ins).exceptAll(del)
      assert(replayed.exceptAll(rd(dir, t)).isEmpty
        && rd(dir, t).exceptAll(replayed).isEmpty, s"algebra $f->$t")
      feed.unpersist()
    }
  }

  test("a merge-on-read delete mutates no file yet still feeds: the " +
      "DV delta inside a shared file triggers the full-diff fallback") {
    val dir = freshTable(Seq((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)), parts = 1)
    FwMaintenance.deleteByKeysMoR(spark, dir, schema,
      Seq(2L).toDF("id"), "id") // v2: same file set, only a .fwdv
    assert(changes(dir, 1L, 2L) === Set(("delete", 2L, "b")))
    // and composed with a later COW update in the same window
    FwMaintenance.merge(spark, dir, schema,
      Seq((3L, "C", 30.0)).toDF("id", "name", "score"), "id") // v3
    assert(changes(dir, 1L, 3L) === Set(
      ("delete", 2L, "b"), ("delete", 3L, "c"), ("insert", 3L, "C")))
    assert(changes(dir, 2L, 3L) === Set(
      ("delete", 3L, "c"), ("insert", 3L, "C")))
  }

  test("same version range refuses; unknown versions fail loudly") {
    val dir = freshTable(Seq((1L, "a", 1.0)))
    intercept[IllegalArgumentException] { cdf(dir, 1L, 1L) }
    intercept[IllegalArgumentException] { cdf(dir, 2L, 1L) }
    val e = intercept[IllegalArgumentException] {
      cdf(dir, 1L, 9L).collect()
    }
    assert(e.getMessage.contains("no version 9"), e.getMessage)
  }
}
