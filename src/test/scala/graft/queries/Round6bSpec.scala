package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q143/d27 batch: the F statistic replays
  * from sequential group sums, and the dedup family is internally
  * consistent (zero cross-cluster pairs).
  */
class Round6bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q143: F replays from a sequential model; positive and finite") {
    val r = q("q143_anova_f").collect().head
    assert(r.getLong(0) === 5L)
    val data = Tables.t(spark, Sf, "orders")
      .join(Tables.t(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(x => x.getString(0) -> x.getLong(1))
    assert(r.getLong(1) === data.length.toLong)
    val groups = data.groupBy(_._1).values.map(_.map(_._2.toDouble))
    val n = data.length.toDouble; val k = groups.size
    val grand = data.map(_._2.toDouble).sum / n
    val ssb = groups.map(g => g.length *
      math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getDouble(2) - f) / f < 1e-6,
      s"F ${r.getDouble(2)} vs sequential $f")
    assert(r.getDouble(2) > 0.0)
  }

  test("d27: zero cross-cluster pairs; histogram counts all clusters") {
    val rows = q("d27_cluster_consistency").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val viol = rows.find(_._1 == "violations").get._3
    assert(viol === 0L, "a d4 pair straddles two d8 clusters")
    val nPairs = rows.find(_._1 == "pairs").get._3
    assert(nPairs > 0L)
    val hist = rows.filter(_._1 == "size_hist")
    assert(hist.nonEmpty)
    // clustered nodes from the pair graph: sizes ≥ 2 (no singletons —
    // every node in a pair has a partner in its component)
    hist.foreach { case (_, size, cnt) =>
      assert(size >= 2, "pair-graph component of size < 2")
      assert(cnt >= 1)
    }
  }
}
