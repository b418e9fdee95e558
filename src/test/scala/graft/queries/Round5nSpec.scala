package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q121/q122/m13 batch: HITS iterations replay
  * from edge sums, the windowed funnel narrows monotonically, and the
  * coverage audit conserves both tables.
  */
class Round5nSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q121: authority1 replays as supplier lineitem count; sorted") {
    val rows = q("q121_hits").collect()
    val nSupp = Tables.t(spark, Sf, "supplier").count()
    assert(rows.length === math.min(20L, nSupp))
    val a2s = rows.map(_.getDouble(3))
    assert(a2s.sameElements(a2s.sortBy(x => -x)), "not sorted desc")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // a1(s) with h0=1 is just the supplier's total lineitem weight
    val top = rows.head
    val expected = Tables.t(spark, Sf, "lineitem")
      .filter(col("l_suppkey") === top.getLong(0)).count()
    assert(top.getDouble(2).toLong === expected)
    rows.foreach(r => assert(r.getDouble(3) > 0))
  }

  test("q122: funnel narrows; rates replay; deadline binds") {
    val r = q("q122_windowed_funnel").collect().head
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np)
    val viewers = Tables.t(spark, Sf, "events")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(nv === viewers)
    assert(r.getDouble(4) === (nc.toDouble / nv * 1e6).round / 1e6)
    assert(r.getDouble(5) === (np.toDouble / nv * 1e6).round / 1e6)
    if (np > 0) {
      // a purchase chain spans at most 48h of funnel time
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 48.0)
    }
  }

  test("m13: both tables conserved; pairing bounded") {
    val rows = q("m13_modality_coverage").collect()
    val nDocs = Tables.t(spark, Sf, "documents").count()
    val nEmb = Tables.t(spark, Sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    val pairedEmb = rows.map(_.getLong(3)).sum
    val orphans = rows.map(_.getLong(5)).sum
    assert(pairedEmb + orphans === nEmb,
      "embeddings not conserved across paired + orphan")
    rows.foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
      if (r.getString(0) == "_orphan_embedding") assert(r.getLong(1) === 0L)
    }
  }
}
