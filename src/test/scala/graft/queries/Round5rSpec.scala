package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for d25: canonical bounded pairs, and one pair's
  * cosine replayed from scratch in Scala over the pruned vocabulary.
  */
class Round5rSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d25: pairs canonical; spot cosine replays from raw tokens") {
    val rows = graft.SparkEntry.queries("d25_tfidf_cosine_pairs")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 1L)
      assert(r.getDouble(3) >= 0.3 && r.getDouble(3) <= 1.0 + 1e-9)
    }
    // replay the highest-cosine pair densely in Scala
    val top = rows.maxBy(_.getDouble(3))
    val docs = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    def vec(id: Long): Map[String, Double] =
      docs(id).groupBy(identity).collect {
        case (t, occ) if dfMap(t) >= 2 && dfMap(t) <= 50 =>
          t -> occ.size * math.log(n / dfMap(t))
      }
    val (va, vb) = (vec(top.getLong(0)), vec(top.getLong(1)))
    val dot = va.keySet.intersect(vb.keySet).toSeq
      .map(t => va(t) * vb(t)).sum
    val cos = dot / (math.sqrt(va.values.map(x => x * x).sum) *
      math.sqrt(vb.values.map(x => x * x).sum))
    assert(math.abs(top.getDouble(3) - cos) < 1e-6,
      s"pair (${top.getLong(0)},${top.getLong(1)}) cosine drifted")
    assert(top.getLong(2) === va.keySet.intersect(vb.keySet).size.toLong)
  }
}
