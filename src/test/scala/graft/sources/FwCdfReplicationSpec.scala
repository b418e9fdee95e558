package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end TABLE REPLICATION over the streaming change data feed:
  * a foreachBatch consumer applies each commit's insert/delete rows to
  * a replica fixed-width table, in commit order, so the replica
  * converges to the source's live state without ever scanning the
  * source — the CDC replication story the CDF exists for.
  */
class FwCdfReplicationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val spec = "id:long:4,name:string:6,score:double:10"
  private val schema = FixedWidth.parseSchema(spec)

  private def readLive(dir: String) =
    spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).load(dir)

  test("a CDF-fed replica converges to the source across appends and " +
      "merge-on-read deletes, applying commits in order") {
    val src = Files.createTempDirectory("fwrepl_src").toFile.getAbsolutePath
    val dst = Files.createTempDirectory("fwrepl_dst").toFile.getAbsolutePath
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "score").coalesce(1)
      .write.format("graft.sources.FixedWidth").option("schema", spec)
      .mode("overwrite").save(src) // v1

    val q = spark.readStream.format("graft.sources.FixedWidth")
      .option("schema", spec).option("readChangeFeed", "true")
      .option("startingVersion", "1").load(src)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          // commits must apply in order: one batch can hold an insert
          // of a row AND its later delete
          val versions = b.select("_commit_version").distinct()
            .as[Long].collect().sorted
          versions.foreach { v =>
            val ofV = b.filter(col("_commit_version") === v)
            // within a commit, deletes apply BEFORE inserts: a COW
            // UPDATE arrives as delete(pre-image) + insert(post-image)
            // of the SAME key — inserting first would leave two copies
            // for the key-delete to kill together
            val del = ofV.filter(col("_change_type") === "delete")
              .select("id")
            if (!del.isEmpty)
              FwMaintenance.deleteByKeysMoR(spark, dst, schema, del, "id")
            val ins = ofV.filter(col("_change_type") === "insert")
              .select("id", "name", "score")
            if (!ins.isEmpty)
              ins.coalesce(1).write
                .format("graft.sources.FixedWidth")
                .option("schema", spec).mode("append").save(dst)
          }
        } finally { b.unpersist(); () }
      }.start()
    try {
      q.processAllAvailable()
      assert(readLive(dst).select("id").as[Long].collect().sorted
        === Array(1L, 2L, 3L))
      // source mutates while the replica tails it
      Seq((4L, "d", 4.0)).toDF("id", "name", "score").coalesce(1)
        .write.format("graft.sources.FixedWidth").option("schema", spec)
        .mode("append").save(src) // v2
      FwMaintenance.deleteByKeysMoR(spark, src, schema,
        Seq(2L).toDF("id"), "id") // v3
      q.processAllAvailable()
      def stateOf(dir: String) = readLive(dir)
        .select("id", "name", "score").as[(Long, String, Double)]
        .collect().toSet
      assert(stateOf(dst) === stateOf(src),
        "replica must converge to the source")
      assert(stateOf(dst).map(_._1) === Set(1L, 3L, 4L))
      // a SQL UPDATE (copy-on-write commit) replicates too: the
      // materialized change data streams delete(pre) + insert(post)
      spark.conf.set("spark.sql.catalog.fwrepl", "graft.sources.FwCatalog")
      spark.sql("DROP TABLE IF EXISTS fwrepl.ns.src")
      spark.sql(s"""CREATE TABLE fwrepl.ns.src (id BIGINT, name STRING,
        score DOUBLE) OPTIONS (path '$src', widths '4,6,10')""")
      spark.sql("UPDATE fwrepl.ns.src SET score = 40.0 WHERE id = 4")
      q.processAllAvailable()
      assert(stateOf(dst) === stateOf(src),
        "replica must survive a SQL UPDATE on the source")
      assert(stateOf(dst).contains((4L, "d", 40.0)))
    } finally q.stop()
  }
}
