package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** Behavioral pins for batch 142: the Hilbert curve expression and the
  * layout comparison it exists for.
  */
class Round11cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("Hilbert2 codegen matches the reference loop, corners included") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (0 until 500).map(_ =>
      (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong)) :+
      (0L, 0L) :+ (4095L, 4095L) :+ (4095L, 0L) :+ (0L, 4095L)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.hilbert2(col("x"), col("y"), 12).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, h) =>
      assert(h === ZOrder.hilbert2Ref(x, y, 12), s"($x, $y)")
    }
  }

  test("Hilbert2 is a bijection on the 32x32 grid") {
    import spark.implicits._
    val grid = for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)
    val ds = grid.toDF("x", "y")
      .select(ZOrder.hilbert2(col("x"), col("y"), 5).as("h"))
      .collect().map(_.getLong(0))
    assert(ds.length === 1024)
    assert(ds.distinct.length === 1024)
    assert(ds.min === 0L && ds.max === 1023L)
  }

  test("consecutive Hilbert codes are always grid neighbors (Z is not)") {
    import spark.implicits._
    val grid = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)
    val byH = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.hilbert2(col("x"), col("y"), 6).as("h"),
        ZOrder.z2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def jumps(sorted: Seq[(Long, Long, Long, Long)]): Int =
      sorted.sliding(2).count {
        case Seq(a, b) =>
          math.abs(a._1 - b._1) + math.abs(a._2 - b._2) > 1
        case _ => false
      }
    val hJumps = jumps(byH.sortBy(_._3).toSeq)
    val zJumps = jumps(byH.sortBy(_._4).toSeq)
    assert(hJumps === 0, "every Hilbert step is a unit grid move")
    assert(zJumps > 0, "the Z curve takes diagonal quadrant jumps")
  }

  test("q355 buckets cover all orders with positive boxes") {
    val Sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q355_hilbert_cluster")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    assert(total === graft.queries.Tables.t(spark, Sf, "orders").count())
    rows.foreach(r => assert(r.getLong(6) > 0))
  }
}
