package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-5 batch: CDC changelog merge, z-order
  * layout diagnostics, weighted Bernoulli sampling, and retention
  * cohorts.
  */
class Round5Spec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q73: merge census matches a sequential brute-force replay") {
    // Re-derive the snapshot + changelog rules row by row on the driver
    // (1.5k orders at sf0.001) and replay latest-wins MERGE semantics
    // sequentially — an independent model of the distributed apply.
    val orders = Tables.t(spark, Sf, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val snap = orders.filter(_._1 % 3 != 0).map(o => o._1 -> o).toMap
    // (seq, op, price) per key — latest (max seq) wins
    val changes = scala.collection.mutable.Map[Long, (Long, String, BigDecimal)]()
    def push(k: Long, seq: Long, op: String, price: BigDecimal): Unit =
      if (!changes.contains(k) || changes(k)._1 < seq)
        changes(k) = (seq, op, price)
    orders.foreach { case (k, _, p) =>
      if (k % 3 == 0 && k % 2 == 1) push(k, 0, "I", p)
      if (k % 5 == 0) push(k, 1, "U", p + 100)
      if (k % 7 == 0 && k % 5 != 0) push(k, 1, "D", BigDecimal(0))
      if (k % 10 == 0) push(k, 2, "U", p + 200)
    }
    val allKeys = snap.keySet ++ changes.keySet
    val expected = allKeys.toSeq.map { k =>
      val inSnap = snap.contains(k)
      val ch = changes.get(k)
      val action = ch match {
        case Some((_, "D", _)) if inSnap => "deleted"
        case Some((_, "D", _))           => "noop_delete"
        case Some(_) if inSnap           => "updated"
        case Some(_)                     => "inserted"
        case None                        => "unchanged"
      }
      val price: Option[BigDecimal] = action match {
        case "deleted" | "noop_delete" => None
        case "unchanged"               => Some(snap(k)._3)
        case _                         => Some(ch.get._3)
      }
      (action, k, price)
    }
    val expByAction = expected.groupBy(_._1).map { case (a, rows) =>
      a -> (rows.size.toLong, rows.flatMap(_._3).sum.toDouble,
        rows.map(_._2).sum)
    }
    val got = q("q73_changelog_merge").collect().map { r =>
      r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2), r.getLong(3))
    }.toMap
    assert(got.keySet == expByAction.keySet)
    expByAction.foreach { case (a, (n, sum, keySum)) =>
      assert(got(a)._1 == n, s"action $a count")
      assert(got(a)._3 == keySum, s"action $a key checksum")
      assert(math.abs(got(a)._2 - sum) < 1e-6, s"action $a price sum")
    }
    // every synthetic path must actually fire
    assert(Set("deleted", "inserted", "updated", "unchanged", "noop_delete")
      .subsetOf(got.keySet))
  }

  test("q74: z-order bounds BOTH dimension spans; lex leaves one wide") {
    val rows = q("q74_zorder").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val (_, zRows, zNat, zBand) = rows("zorder")
    val (_, lRows, lNat, lBand) = rows("lex")
    assert(zRows == lRows, "both layouts block the same rows")
    // a 16-z-value block exposes only the low 2 bits of each dimension
    assert(zNat <= 3.0 && zBand <= 3.0,
      s"z-order spans ($zNat, $zBand) exceed the 2-bit window")
    // nation-major blocks pin nation but leave the band span wide open
    assert(lNat <= zNat, "lex is perfectly clustered on the major dim")
    assert(lBand > 2 * zBand,
      s"lex band span $lBand should dwarf z-order's $zBand")
  }

  test("q75: sampling tracks the quantity-proportional rate and HT is unbiased") {
    q("q75_weighted_sample").collect().foreach { r =>
      val (nTotal, nSampled) = (r.getLong(1), r.getLong(2))
      val (achieved, expected) = (r.getDouble(6), r.getDouble(7))
      val htEst = r.getDouble(8)
      assert(nSampled > 0 && nSampled < nTotal)
      assert(math.abs(achieved - expected) < 0.05,
        s"achieved $achieved vs expected $expected")
      assert(math.abs(htEst - nTotal) / nTotal < 0.15,
        s"Horvitz-Thompson estimate $htEst vs true $nTotal")
    }
  }

  test("q75: membership is deterministic across runs") {
    val a = q("q75_weighted_sample").collect().map(_.toString).toSeq
    val b = q("q75_weighted_sample").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("q76: cohorts anchor at retention 1.0 and never exceed it") {
    val rows = q("q76_retention_cohorts").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.foreach { case (wk, rs) =>
      val offsets = rs.map(_.getLong(1)).toSeq
      assert(offsets.contains(0), s"cohort $wk missing its anchor week")
      rs.foreach { r =>
        val ret = r.getDouble(4)
        assert(ret > 0 && ret <= 1.0, s"cohort $wk retention $ret")
        if (r.getLong(1) == 0)
          assert(ret == 1.0, s"cohort $wk anchor retention must be 1.0")
      }
    }
    // the whole observation window is 5 ISO weeks (Jan 2024 events)
    assert(rows.map(_.getLong(1)).max <= 4)
  }
}
