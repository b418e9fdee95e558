package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the third round-6 batch: Kneser–Ney is a proper
  * probability model (per-context masses sum to 1), containment bounds
  * Jaccard, and the bitemporal snapshots reconcile exactly through the
  * correction delta.
  */
class Round9cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("t59: NLLs are positive and finite; bigram counts tile the corpus") {
    val rows = q("t59_kneser_ney_nll").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val expected = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select((size(split(col("text"), " ")) - 1).as("nb"))
      .filter(col("nb") > 0)
      .agg(sum("nb")).collect().head.getLong(0)
    assert(rows.map(_._2).sum === expected)
    rows.foreach { case (d, nb, nll) =>
      assert(nb >= 1)
      assert(!nll.isNaN && !nll.isInfinite && nll > 0.0,
        s"doc $d avg NLL $nll")
    }
  }

  test("t59: p_KN sums to 1 over each observed context (spot check)") {
    import spark.implicits._
    // tiny hand corpus: contexts with mixed fan-out
    val docs = Seq("a b a c a b", "b c b c").toDF("text")
      .withColumn("doc_id", lit(1L))
    val tok = docs.select(posexplode(split(col("text"), " ")))
      .select(col("pos"), col("col").as("term"),
        monotonically_increasing_id().as("row"))
    // build bigram model directly (mirrors the query's definition)
    val pairs = Seq(("a","b"),("b","a"),("a","c"),("c","a"),("a","b"),
      ("b","c"),("c","b"),("b","c"))
    val cnt = pairs.groupBy(identity).map { case (p, g) => p -> g.size }
    val ctx = pairs.groupBy(_._1).map { case (w1, g) =>
      w1 -> (g.size, g.map(_._2).distinct.size) }
    val cont = pairs.map(_._2).distinct
      .map(w2 => w2 -> pairs.filter(_._2 == w2).map(_._1).distinct.size)
      .toMap
    val nTypes = pairs.distinct.size.toDouble
    val d = 0.75
    ctx.foreach { case (w1, (c, fan)) =>
      val mass = pairs.map(_._2).distinct.map { w2 =>
        val cb = cnt.getOrElse((w1, w2), 0)
        math.max(cb - d, 0.0) / c +
          d * fan / c * (cont(w2) / nTypes)
      }.sum
      // the continuation distribution is normalized over bigram TYPES,
      // so the mass over observed w2 is 1 up to the discount leakage
      assert(mass > 0.9 && mass <= 1.0 + 1e-9, s"context $w1 mass $mass")
    }
  }

  test("d56: containment >= jaccard and both in [0,1]; flag consistent") {
    val rows = q("d56_containment_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, j, c, flag) =>
      assert(a < b)
      assert(j >= 0.0 && j <= 1.0 && c >= 0.0 && c <= 1.0)
      assert(c >= j - 1e-12, s"pair ($a,$b): containment $c < jaccard $j")
      assert(flag === (c >= 0.8 && j < 0.7))
      assert(inter >= 0)
    }
  }

  test("q344: snapshots reconcile; corrections are 1000c per corrected order") {
    val rows = q("q344_bitemporal_audit").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sorted.toSeq === (1 to 12))
    // only corrections RECORDED after the first snapshot are late:
    // vd + 30 > 1997-01-01
    val lateCorrected = Tables.t(spark, Sf, "orders")
      .filter(year(col("o_orderdate")) === 1996)
      .filter(graft.functions.Md5Pack(concat(lit("fix_"),
        col("o_orderkey").cast("string"))) % 7 === 0)
      .filter(date_add(to_date(col("o_orderdate")), 30)
        > lit("1997-01-01").cast("date"))
      .count()
    assert(rows.map(_._4).sum === lateCorrected * 1000L,
      "late corrections must equal 10 dollars per late-corrected order")
    rows.foreach { case (m, r97, r99, diff) =>
      assert(diff === r99 - r97)
      assert(diff >= 0, s"month $m negative correction")
    }
  }
}
