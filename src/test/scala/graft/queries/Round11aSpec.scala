package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** Behavioral pins for batch 141: z-order layout, ORC round-trip,
  * integer PageRank.
  */
class Round11aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("ZOrder.z2 column expression matches the bit-loop reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0 until 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) :+
      (0L, 0L) :+ (65535L, 65535L) :+ (65535L, 0L) :+ (0L, 65535L)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.z2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z === ZOrder.z2Ref(x.toInt, y.toInt), s"($x, $y)")
    }
  }

  test("z-order buckets beat a linear sort's bounding boxes on a grid") {
    import spark.implicits._
    // a full 256x256 grid, 16 buckets each way: the z-curve should give
    // every bucket a compact square-ish box; bucketing by x alone gives
    // full-height stripes — far larger summed area.
    val grid = for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", ZOrder.z2(col("x"), col("y")))
    // z buckets span 4096 z-codes = 256*256/16 points each
    val zArea = df
      .withColumn("zb", expr("z div 4096"))
      .groupBy("zb")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("a"))
      .agg(sum("a")).head.getLong(0)
    val linArea = df
      .withColumn("xb", expr("x div 16"))
      .groupBy("xb")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("a"))
      .agg(sum("a")).head.getLong(0)
    // 16 z-buckets of 4096 points are 64x64 squares: area 16*4096.
    // 16 x-stripes are 16x256: same cell count but the ratio flips once
    // boxes are per-bucket prunable ranges on BOTH columns; with equal
    // areas here, tighten the claim per dimension instead:
    val zySpan = df.withColumn("zb", expr("z div 4096"))
      .groupBy("zb").agg((max("y") - min("y") + 1).as("s"))
      .agg(sum("s")).head.getLong(0)
    val linYSpan = df.withColumn("xb", expr("x div 16"))
      .groupBy("xb").agg((max("y") - min("y") + 1).as("s"))
      .agg(sum("s")).head.getLong(0)
    assert(zArea === linArea) // same tiling cardinality on the full grid
    // the y-envelope is 4x tighter under the z-curve (64 vs 256/bucket)
    assert(zySpan * 3 < linYSpan, s"zySpan=$zySpan linYSpan=$linYSpan")
  }

  test("q352: buckets are disjoint curve ranges covering all orders") {
    val rows = graft.SparkEntry.queries("q352_zorder_cluster")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val orders = graft.queries.Tables.t(spark, Sf, "orders").count()
    assert(total === orders)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2)) // max_x >= min_x
      assert(r.getLong(5) >= r.getLong(4))
      assert(r.getLong(6) > 0)             // box_area positive
    }
  }

  test("q353: ORC scan sees pushed filters and a pruned schema") {
    val df = graft.SparkEntry.queries("q353_orc_pushdown")(spark, Sf)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.toLowerCase.contains("orc"), "plan should read ORC")
    assert(scan.contains("PushedFilters: [") &&
      !scan.contains("PushedFilters: []"),
      "quantity/date predicates must reach the ORC reader")
    // the 5-column file is read back with only the 4 referenced columns
    assert(!scan.contains("l_orderkey"), "unused column must be pruned")
    assert(df.count() > 0)
  }

  test("q354: three-iteration integer PageRank conserves scaled mass") {
    val rows = graft.SparkEntry.queries("q354_pagerank_int")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 25)
    val mass = rows.map(_._2).sum
    // floor divisions only ever drop mass, never create it: total stays
    // within one part-per-thousand of the scale, strictly below it.
    assert(mass <= 1000000000000L)
    assert(mass > 999000000000L, s"mass=$mass")
    assert(rows.map(_._2).forall(_ > 0))
    // at sf0.001 the nation trade graph is complete and regular, so a
    // uniform fixpoint is the CORRECT answer — don't assert spread here
  }
}
