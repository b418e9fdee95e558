package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the m9/s11/q113 batch: scenes partition the frame
  * sequence, feedback retrieval is well-formed, and the Theil–Sen fit
  * replays on the driver.
  */
class Round5iSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("m9: scenes partition each media's 8 frames contiguously") {
    val rows = q("m9_scene_cuts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))
    val nMedia = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull).count()
    val byMedia = rows.groupBy(_._1)
    assert(byMedia.size.toLong === nMedia)
    byMedia.foreach { case (m, scenes) =>
      val sorted = scenes.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        s"media $m scene ids not dense")
      assert(sorted.map(_._3).sum === 8L, s"media $m frames lost")
      assert(sorted.head._4 === 0 && sorted.last._5 === 7)
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, lastA), (_, _, _, firstB, _)) =>
          assert(firstB === lastA + 1, s"media $m scenes not contiguous")
        case _ =>
      }
    }
    assert(rows.exists(_._2 > 0), "no media ever cut — threshold vacuous")
  }

  test("s11: kept + new = 10 per probe; expansion actually moves lists") {
    val rows = q("s11_rocchio").collect()
    val nProbes = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull && col("vec_id") % 50 === 0).count()
    assert(rows.length.toLong === nProbes)
    rows.foreach { r =>
      val (kept, fresh) = (r.getLong(1), r.getLong(2))
      assert(kept >= 0 && kept <= 10)
      assert(kept + fresh === 10L)
    }
    // the centroid pull should keep most of the list but not freeze it
    assert(rows.map(_.getLong(1)).sum > rows.length * 5L,
      "feedback rewrote almost everything — centroid math suspect")
  }

  test("q113: Theil–Sen slope and intercept replay on the driver") {
    val rows = q("q113_theil_sen").collect()
    val mon = Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag"),
        ((year(to_date(col("l_shipdate"))) - 1992) * 12 +
          month(to_date(col("l_shipdate"))) - 1).cast("long").as("mx"),
        col("l_quantity").cast("decimal(18,2)").as("qd"))
      .groupBy("l_returnflag", "mx").agg(sum("qd").as("yd"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) =>
        f -> rs.map(r => (r.getLong(1), r.getDecimal(2).doubleValue()))
      }
    def med(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val f = r.getString(0)
      val pts = mon(f)
      assert(r.getLong(1) === pts.length.toLong)
      val slopes = for {
        (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
      } yield (y2 - y1) / (x2 - x1).toDouble
      val ms = med(slopes.toArray)
      assert(math.abs(r.getDouble(2) - ms) < 1e-5, s"$f slope")
      val ic = med(pts.map { case (x, y) => y - ms * x }.toArray)
      assert(math.abs(r.getDouble(3) - ic) < 1e-4, s"$f intercept")
    }
  }
}
