package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the m8/t25/q110 batch: batch packing is dense and
  * capacity-respecting, boilerplate detection finds exactly the planted
  * headers, and the MAD chain replays on the driver.
  */
class Round5gSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("m8: batches dense per bucket, capacity 32, only the tail ragged") {
    val rows = q("m8_aspect_batches").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_._3).sum === total, "batches do not partition corpus")
    rows.groupBy(_._1).foreach { case (bucket, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong),
        s"bucket $bucket batch ids not dense from 0")
      sorted.init.foreach { case (_, bid, n) =>
        assert(n === 32L, s"bucket $bucket batch $bid not full")
      }
      assert(sorted.last._3 <= 32L)
    }
  }

  test("t25: planted headers found verbatim, odd sources stay clean") {
    val rows = q("t25_boilerplate_prefix").collect()
    val total = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val src = r.getString(0)
      val even = src.stripPrefix("src").toInt % 2 == 0
      val header = s"[$src syndicated feed] "
      if (even) {
        assert(r.getBoolean(4), s"$src header not detected")
        assert(r.getString(3).startsWith(header.take(10)),
          s"$src boilerplate '${r.getString(3)}' missing planted header")
        assert(r.getLong(2) >= header.length - 1, s"$src lcp too short")
      } else {
        assert(r.getLong(2) < 10, s"$src phantom boilerplate")
        assert(!r.getBoolean(4))
      }
    }
  }

  test("q110: MAD chain replays on the driver for every flag") {
    val rows = q("q110_mad_outliers").collect()
    val qs = Tables.t(spark, Sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    def med(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    rows.foreach { r =>
      val f = r.getString(0)
      val xs = qs(f)
      val m = med(xs)
      val devs = xs.map(x => math.abs(x - m)).sorted
      val mad = med(devs)
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getDouble(2) === m, s"$f median")
      assert(r.getDouble(3) === mad, s"$f mad")
      val outs = devs.count(_ > mad * 4.4478)
      assert(r.getLong(4) === outs.toLong, s"$f outlier count")
      assert(math.abs(r.getDouble(5) - outs.toDouble / xs.length) < 1e-6)
    }
  }
}
