package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q93–q96 / s6 / t23 batch: the HLL estimate
  * lands inside its error envelope, the truncated EMA stays inside the
  * lag window's value range, the chi-square pieces reconcile, the bitmap
  * distinct is EXACTLY count-distinct, hybrid-RRF ranks are well-formed,
  * and the diversity ratios obey their algebraic bounds.
  */
class Round5cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q93: HLL estimate within the m=64 error envelope; registers sane") {
    val rows = q("q93_hll_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(1)
      val exact = r.getLong(2)
      val zeros = r.getInt(3)
      assert(zeros >= 0 && zeros <= 64)
      assert(est > 0.0)
      // standard error 1.04/sqrt(64) ≈ 13%; 3σ envelope
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 0.4, s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("q94: EMA bounded by the lag window's min/max; first row equals v") {
    val rows = q("q94_ema").collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val series = rs.sortBy(_._2.toString)
      // first day: only lag 0 exists → renormalized EMA is v itself
      assert(math.abs(series.head._4 - series.head._3) < 1e-5)
      series.zipWithIndex.foreach { case ((_, _, _, ema), i) =>
        val window = series.slice(math.max(0, i - 9), i + 1).map(_._3)
        assert(ema >= window.min - 1e-5 && ema <= window.max + 1e-5,
          s"ema $ema outside lag-window range [${window.min},${window.max}]")
      }
    }
  }

  test("q95: chi2 non-negative; totals and dof reconcile with the input") {
    val r = q("q95_chi2").head()
    val nEvents = Tables.t(spark, Sf, "events").count()
    assert(r.getLong(0) === nEvents)
    assert(r.getDouble(3) >= 0.0)
    val types = Tables.t(spark, Sf, "events")
      .select("event_type").distinct().count().toInt
    // 4 hour-quadrants are always populated on this data
    assert(r.getInt(2) === (types - 1) * 3)
    assert(r.getInt(1) <= types * 4)
  }

  test("q96: bitmap distinct is EXACT count-distinct; merge dedups") {
    val rows = q("q96_bitmap_distinct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val exact = Tables.t(spark, Sf, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq === exact.toSeq)
    rows.foreach { case (t, period, sumDaily) =>
      assert(sumDaily >= period, s"$t: daily sum below period unique")
    }
  }

  test("s6: fused top-20 is well-formed (ranks in 1..100, rrf descending)") {
    val rows = q("s6_hybrid_rrf").collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).distinct.length === 20)
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.sameElements(rrfs.sortBy(-_)), "rrf not descending")
    rows.foreach { r =>
      val kw = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val vec = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(kw.nonEmpty || vec.nonEmpty, "row on neither rank list")
      (kw ++ vec).foreach(rk => assert(rk >= 1 && rk <= 100))
      val expect = kw.map(k => 1.0 / (60 + k)).getOrElse(0.0) +
        vec.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-7)
    }
  }

  test("d20: every emitted pair shares its ENTIRE 4-subspace PQ code") {
    val rows = q("d20_semantic_block_dedup").collect()
    assert(rows.nonEmpty, "no code-block pairs at sf0.001")
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1), "pair not ordered"))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      === rows.length, "duplicate pairs")
    // Independent re-encode: the pair invariant is CODE equality (the
    // blocking contract), not a cosine floor — the synthetic embeddings
    // hold no true near-duplicates, so d20's output is the scored
    // candidate frame a threshold would then cut.
    val e = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull)
    val raw = graft.functions.VectorOps.toDouble(col("embedding"))
    val vecs = e.select(col("vec_id"),
      transform(raw, x => x / graft.functions.VectorOps.norm(raw)).as("emb"))
    val cb = graft.operators.AnnPq.codebook(vecs, "vec_id", "emb", 16)
    val codes = graft.operators.AnnPq.withCodes(vecs, "emb", cb, m = 4)
      .select(col("vec_id"), col("codes").cast("array<string>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(codes(a) === codes(b), s"pair ($a,$b) codes differ")
    }
  }

  test("q97: histogram partitions the key population; shares reconcile") {
    val rows = q("q97_skew_census").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getLong(1)).sum
    val exact = Tables.t(spark, Sf, "orders")
      .select("o_custkey").distinct().count()
    assert(keys === exact, "histogram drops or double-counts keys")
    val shareSum = rows.map(_.getDouble(5)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), "min_n > max_n")
      // bucket b holds counts in [2^b, 2^(b+1))
      val b = r.getInt(0)
      assert(r.getLong(3) >= (1L << b) && r.getLong(4) < (1L << (b + 1)))
    }
    // cumulative-from-heavy share reaches 1.0 at the lightest bucket
    val lightest = rows.minBy(_.getInt(0))
    assert(math.abs(lightest.getDouble(6) - 1.0) < 1e-4)
  }

  test("q98: rolling median is a window member and robust to the frame") {
    val rows = q("q98_rolling_median").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getInt(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val series = rs.sortBy(_._2)
      series.zipWithIndex.foreach { case ((_, _, _, nWin, med), i) =>
        val window = series.slice(math.max(0, i - 14), i + 1).map(_._3)
        assert(nWin === window.length)
        // the lower median is an actual member of the window
        assert(window.contains(med), s"median $med not in window")
        val sorted = window.sorted
        assert(med === sorted((window.length - 1) / 2))
      }
    }
  }

  test("q99: z-scores reconcile with a direct trailing-window model") {
    val rows = q("q99_rolling_zscore").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getInt(3), if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getBoolean(6)))
    assert(rows.nonEmpty)
    var checked = 0
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val series = rs.sortBy(_._2)
      // first row has no reference window → no z, never anomalous
      assert(series.head._5.isEmpty && !series.head._6)
      series.zipWithIndex.foreach { case ((_, _, v, nRef, z, flag), i) =>
        val ref = series.slice(math.max(0, i - 14), i).map(_._3)
        assert(nRef === ref.length)
        if (ref.length >= 2 && z.nonEmpty) {
          val mean = ref.sum / ref.length
          val varr = ref.map(x => (x - mean) * (x - mean)).sum / (ref.length - 1)
          if (varr > 0) {
            val zModel = (v - mean) / math.sqrt(varr)
            assert(math.abs(z.get - zModel) < 1e-3,
              s"z ${z.get} vs model $zModel")
            assert(flag === (math.abs(z.get) > 3.0))
            checked += 1
          }
        }
      }
    }
    assert(checked > 50, s"only $checked z-scores checked")
  }

  test("q100: JSONL round-trip preserves the census; corrupt line isolated") {
    val rows = q("q100_jsonl_ingest").collect()
    val byLang = rows.map(r => (if (r.isNullAt(0)) null else r.getString(0))
      -> ((r.getLong(1), r.getLong(2)))).toMap
    // the planted corrupt line is its own NULL-lang group: counted once,
    // flagged once, and it never aborts the read
    assert(byLang(null) === ((1L, 1L)))
    val expected = Tables.t(spark, Sf, "documents")
      .filter(col("doc_id") < 200)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (lang, n) =>
      assert(byLang(lang) === ((n, 0L)), s"lang $lang census drifted")
    }
    assert(rows.length === expected.size + 1)
  }

  test("d21: yield curve reconciles with direct distinct counts") {
    val rows = q("d21_dedup_yield").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    val docs = Tables.t(spark, Sf, "documents").filter(col("text").isNotNull)
    assert(rows.map(_._2).sum === docs.count())
    val totalUnique = docs.select(md5(col("text"))).distinct().count()
    assert(rows.last._4 === totalUnique, "cumulative curve misses uniques")
    var cum = 0L
    rows.foreach { case (_, nDocs, nNew, cumU, dupRate) =>
      assert(nNew <= nDocs)
      cum += nNew
      assert(cumU === cum, "cumulative sum broken")
      assert(dupRate >= 0.0 && dupRate <= 1.0)
      assert(math.abs(dupRate - (1.0 - nNew.toDouble / nDocs)) < 1e-6)
    }
  }

  test("q101: audit reports clean edges as clean and broken edges as broken") {
    val rows = q("q101_fk_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 8)
    // harness data is referentially clean — every orphan count must be a
    // VERIFIED zero, with child counts matching the direct census
    rows.foreach { case (edge, _, orphans) =>
      assert(orphans === 0L, s"$edge reports $orphans orphans on clean data")
    }
    val li = Tables.t(spark, Sf, "lineitem").count()
    assert(rows.map { case (e, n, _) => e -> n }.toMap
      .apply("lineitem.l_orderkey->orders") === li)
    // the same anti-join formulation MUST surface violations when they
    // exist: drop half the parent side and recount one edge
    import org.apache.spark.sql.functions.col
    val child = Tables.t(spark, Sf, "orders")
      .filter(col("o_custkey").isNotNull)
    val halfParent = Tables.t(spark, Sf, "customer")
      .filter(col("c_custkey") % 2 === 0)
    val orphans = child.select(col("o_custkey").as("k"))
      .join(halfParent.select(col("c_custkey").as("k")), Seq("k"), "left_anti")
      .count()
    val direct = child.filter(col("o_custkey") % 2 =!= 0).count()
    assert(orphans === direct && orphans > 0,
      s"planted violation not detected ($orphans vs $direct)")
  }

  test("q102: trend fits reconcile with a direct least-squares model") {
    val rows = q("q102_trend_slope").collect()
    assert(rows.nonEmpty)
    val daily = Tables.t(spark, Sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(round(col("value"), 6).cast("decimal(18,6)"))
        .cast("double") / count(lit(1)), 6).as("v"))
      .withColumn("x", datediff(col("day"), to_date(lit("2025-01-01"))))
      .collect().map(r => (r.getString(0), r.getInt(3), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (et, n, slope, icept, r2) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val pts = daily(et).map(p => (p._2.toDouble, p._3))
      assert(n === pts.length)
      val (mx, mv) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
      val sxy = pts.map(p => (p._1 - mx) * (p._2 - mv)).sum
      val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
      assert(math.abs(slope - sxy / sxx) < 1e-4, s"$et slope drifted")
      assert(math.abs(icept - (mv - sxy / sxx * mx)) < 1e-2,
        s"$et intercept drifted")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"$et r2 $r2 out of range")
    }
  }

  test("t23: diversity ratios obey their algebraic bounds") {
    val rows = q("t23_lexical_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, types) = (r.getLong(1), r.getLong(2))
      assert(types <= n && types >= 1)
      val ttr = r.getDouble(3)
      assert(ttr > 0.0 && ttr <= 1.0)
      if (!r.isNullAt(4)) {
        val simpson = r.getDouble(4)
        assert(simpson >= 0.0 && simpson <= 1.0)
      }
      val topShare = r.getDouble(5)
      // top_share is rounded to 6 decimals → half-ulp slack of 5e-7
      assert(topShare >= 1.0 / types - 1e-6 && topShare <= 1.0)
    }
  }
}
