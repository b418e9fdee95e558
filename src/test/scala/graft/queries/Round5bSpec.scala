package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the q82–q85 batch: transition-probability rows
  * normalize, the correlation matrix is a valid correlation set, the
  * winsorized mean moves toward the center, and the reservoir honors
  * its fixed-size contract.
  */
class Round5bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q82: outgoing probabilities sum to ~1 per from_type") {
    val rows = q("q82_markov_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from probabilities sum to $pSum")
    }
  }

  test("q83: correlations are in [-1,1] and the pair set is complete") {
    val rows = q("q83_correlation_matrix").collect()
    assert(rows.length === 6) // C(4,2) upper triangle
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"${r.getString(0)}~${r.getString(1)}: $c")
    }
    // every unordered column pair appears exactly once
    val pairs = rows.map(r => Set(r.getString(0), r.getString(1))).toSet
    assert(pairs.size === 6, "duplicate or missing pairs")
  }

  test("q84: winsorized mean lies between the clip bounds; ~2% rows clipped") {
    val rows = q("q84_winsorize").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val clipped = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    val frac = clipped.toDouble / n
    assert(frac > 0.005 && frac < 0.05, s"clip fraction $frac out of band")
    rows.foreach { r =>
      assert(r.getLong(2) > 0 || r.getLong(3) > 0 || r.getLong(1) < 100,
        "groups of this size should clip something")
    }
  }

  test("q87: version chains are well-formed (contiguous, one current, no post-delete versions)") {
    val rows = q("q87_scd2_intervals").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val chain = vs.sortBy(_._2)
      // every non-final version is closed, and closed at a later seq
      chain.init.foreach { case (_, from, to, _) =>
        assert(to != -1L && to > from, s"key $k broken chain")
      }
      // at most one open (current) version, and only the last can be open
      val open = chain.filter(_._3 == -1L)
      assert(open.length <= 1, s"key $k has ${open.length} open versions")
      open.foreach(o => assert(o == chain.last, s"key $k open version not last"))
      assert(chain.count(_._4) === open.length, "is_current flag mismatch")
    }
  }

  test("q88: counts partition users; z-score is finite and consistent") {
    val r = q("q88_ab_test").head()
    val (nA, convA, nB, convB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nA > 0 && nB > 0)
    assert(convA <= nA && convB <= nB)
    val users = Tables.t(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(nA + nB === users)
    // z is NULL only when the pooled variance degenerates (all or no
    // users converted) — legal on tiny slices, never NaN/infinite
    if (!r.isNullAt(6)) {
      val z = r.getDouble(6)
      assert(!z.isNaN && math.abs(z) < 20.0, s"z=$z")
    }
  }

  test("d17: pairs cross the boundary and are exactly d4's crossing subset") {
    import org.apache.spark.sql.functions.{col, expr}
    val bmax = Tables.t(spark, Sf, "documents")
      .agg(expr("max(doc_id) * 4 div 5")).head().getLong(0)
    val inc = q("d17_incremental_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    inc.foreach { case (o, n) =>
      assert(o < bmax && n >= bmax, s"pair ($o,$n) does not cross $bmax")
    }
    val d4cross = q("d4_minhash_pairs")
      .filter(col("a_id") < bmax && col("b_id") >= bmax)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === d4cross, "incremental pairs diverge from d4's crossing subset")
  }

  test("q86: attributed purchases cover every purchase exactly once") {
    import org.apache.spark.sql.functions.col
    val rows = q("q86_attribution").collect()
    val total = rows.map(_.getLong(1)).sum
    val purchases = Tables.t(spark, Sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(total === purchases)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("click", "view", "direct")))
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("q85: exactly k rows per group, ranks contiguous, priorities ascending") {
    val rows = q("q85_group_reservoir").collect()
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.length === 5, s"$et sampled ${rs.length} rows")
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 5).toSeq)
      val pris = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(pris.sameElements(pris.sorted), s"$et priorities not ascending")
    }
  }
}
