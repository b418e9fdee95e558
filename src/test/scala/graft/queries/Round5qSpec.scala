package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the t27/s13 batch: skip-gram counts dominate
  * t12's adjacent bigrams, and mined triplets are genuinely hardest
  * per label side.
  */
class Round5qSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("t27: skip-gram pair count >= adjacent bigram count per pair") {
    val rows = q("t27_skipgram_pmi").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val pmis = rows.map(_.getDouble(3))
    assert(pmis.sameElements(pmis.sorted.reverse), "not sorted by pmi desc")
    // replay one pair's skip-gram count against a direct recount
    val h = rows.maxBy(_.getLong(2))
    val (w1, w2) = (h.getString(0), h.getString(1))
    val recount = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(split(col("text"), " ").as("tk"))
      .select(explode(expr(
        s"""filter(transform(sequence(0, size(tk) - 1), i ->
           |  CASE WHEN i + 1 < size(tk) AND tk[i] = '$w1'
           |    AND tk[i+1] = '$w2' THEN 1 ELSE 0 END +
           |  CASE WHEN i + 2 < size(tk) AND tk[i] = '$w1'
           |    AND tk[i+2] = '$w2' THEN 1 ELSE 0 END), x -> x > 0)"""
          .stripMargin)).as("hit"))
      .agg(sum(col("hit"))).collect().head.getLong(0)
    assert(h.getLong(2) === recount, s"($w1,$w2) skip-gram count")
  }

  test("s13: triplet sides are hardest; margins replay") {
    val rows = q("s13_triplet_mining").collect()
    assert(rows.nonEmpty)
    val labels = Tables.t(spark, Sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (p, posId, negId) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(labels(posId) === labels(p), "positive has wrong label")
      assert(labels(negId) !== labels(p), "negative shares the label")
      assert(posId != p && negId != p)
      val m = BigDecimal(r.getDouble(2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP) -
        BigDecimal(r.getDouble(4)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(5) === m.toDouble, "margin does not replay")
    }
  }
}
