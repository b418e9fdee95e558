package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout behaviors the 100 TB posture depends on: Hive-style
  * partitioned writes prune at the directory level, and the pruning is
  * visible in the plan — not just assumed.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("partitioned write + filter prunes partitions at the source") {
    val out = Files.createTempDirectory("events-part").toString
    Tables.t(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val dirs = new java.io.File(out).list().filter(_.startsWith("event_type="))
    assert(dirs.length === 5)

    val clicks = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter in plan:\n$plan")
    assert(clicks.count() === 210)

    // Only the matching directory's files are read.
    val scanned = clicks.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("event_type=click")))
  }
}
