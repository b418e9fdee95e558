package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** STREAMING INCREMENTAL VIEW MAINTENANCE over the change data feed:
  * a foreachBatch consumer folds each commit's insert/delete rows into
  * a keyed aggregate view (count + sum per group), never rescanning
  * the source — q380's batch IVM theorem running continuously. The
  * maintained view must equal the direct aggregation of the live
  * table after appends AND merge-on-read deletes, groups must appear
  * and disappear, and a checkpoint restart must resume mid-history
  * without double-counting (the offsets are commit versions, so
  * exactly-once folding comes from the checkpoint).
  */
class FwCdfStreamIvmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,grp:string:3,score:double:10"
  private val schema = FixedWidth.parseSchema(spec)

  // the maintained view: grp -> (count, sum-in-cents)
  private val view =
    scala.collection.mutable.Map.empty[String, (Long, Long)]

  private def fold(batch: org.apache.spark.sql.DataFrame): Unit = {
    val b = batch.persist()
    try {
      val versions = b.select("_commit_version").distinct()
        .as[Long].collect().sorted
      versions.foreach { v =>
        b.filter(col("_commit_version") === v)
          .select(col("_change_type"), col("grp"),
            (col("score") * 100).cast("long").as("cents"))
          .collect().foreach { r =>
            val sign = if (r.getString(0) == "insert") 1L else -1L
            val (c, s) = view.getOrElse(r.getString(1), (0L, 0L))
            val nc = c + sign
            val ns = s + sign * r.getLong(2)
            if (nc == 0L) view.remove(r.getString(1))
            else view(r.getString(1)) = (nc, ns)
          }
      }
    } finally { b.unpersist(); () }
  }

  private def direct(dir: String): Map[String, (Long, Long)] =
    spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).load(dir)
      .groupBy("grp")
      .agg(count(lit(1)).as("c"),
        sum((col("score") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("the CDF-maintained aggregate equals the direct aggregation " +
      "across appends, deletes, group birth/death, and a restart") {
    val src = Files.createTempDirectory("fwivm_src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("fwivm_ck").toFile.getAbsolutePath
    view.clear()
    Seq((1L, "aa", 1.5), (2L, "aa", 2.5), (3L, "bb", 3.0))
      .toDF("id", "grp", "score").coalesce(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("overwrite").save(src) // v1

    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.FixedWidth")
        .option("schema", spec).option("readChangeFeed", "true")
        .option("startingVersion", "1").load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          fold(b))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(view.toMap === direct(src))
    assert(view.keySet === Set("aa", "bb"))

    // v2: append births group cc; v3: MoR delete kills bb entirely
    Seq((4L, "cc", 4.0), (5L, "aa", 0.5))
      .toDF("id", "grp", "score").coalesce(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("append").save(src)
    FwMaintenance.deleteByKeysMoR(spark, src, schema,
      Seq(Tuple1(3L)).toDF("id"), "id")
    // RESTART from the checkpoint: only v2..v3 may fold (v1 already
    // counted — double-folding would show up as doubled counts)
    run()
    assert(view.toMap === direct(src))
    assert(!view.contains("bb"), "deleted group must vanish")
    assert(view("aa")._1 === 3L)
    assert(view("cc") === ((1L, 400L)))
  }
}
