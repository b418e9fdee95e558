package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-4 operators: contamination checking,
  * LSH-bucketed embedding dedup, PII redaction, Zipf diagnostics, and the
  * new relational surface (unpivot / lateral / islands / ORC).
  */
class Round4Spec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("d9: contamination fractions are in (0,1], only train docs reported") {
    val rows = q("d9_contamination").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 100, "bench doc leaked into the report")
      val (nSh, nHits) = (r.getLong(1), r.getLong(2))
      assert(nHits >= 1 && nHits <= nSh)
      val frac = r.getDouble(3)
      assert(frac > 0.0 && frac <= 1.0)
    }
  }

  test("d9: a reported doc really shares a 5-gram with the benchmark half") {
    val docs = Tables.t(spark, Sf, "documents")
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id"),
        graft.functions.ShinglesOf(split(col("text"), " "), 5).as("sh"))
    val flagged = q("d9_contamination").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(flagged.nonEmpty)
    val sample = flagged.head
    val benchGrams = docs.filter(col("doc_id") < 100)
      .select(explode(col("sh")).as("g")).distinct()
      .collect().map(_.getString(0)).toSet
    val docGrams = docs.filter(col("doc_id") === sample)
      .select(explode(col("sh")).as("g"))
      .collect().map(_.getString(0)).toSet
    assert(docGrams.intersect(benchGrams).nonEmpty,
      s"doc $sample flagged but shares no 5-gram with the benchmark set")
  }

  test("d10: pairs are ordered, above threshold, and cosines are exact") {
    val rows = q("d10_embedding_lsh_pairs").collect()
    assert(rows.nonEmpty)
    val emb = Tables.t(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    rows.foreach { r =>
      val (a, b, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      assert(cos >= 0.3)
      val (va, vb) = (emb(a), emb(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val direct = dot / (math.sqrt(va.map(x => x * x).sum) *
        math.sqrt(vb.map(x => x * x).sum))
      assert(math.abs(direct - cos) < 1e-4,
        s"pair ($a,$b): reported $cos vs direct $direct")
    }
  }

  test("t10: every doc yields exactly one email/phone/url; redaction is total") {
    val out = q("t10_pii_redact")
    val counts = out.agg(
      min(col("n_emails")), max(col("n_emails")),
      min(col("n_phones")), max(col("n_phones")),
      min(col("n_urls")), max(col("n_urls"))).collect()(0)
    (0 until 6).foreach(i => assert(counts.getInt(i) == 1,
      s"expected exactly one PII hit per kind, got $counts"))
    // Re-run the redaction chain and scan the redacted text: no residual
    // matches of any pattern may survive (the property that matters for a
    // real PII scrubber).
    val did = col("doc_id").cast("string")
    val full = concat(col("text"),
      lit(" Contact user"), did, lit("@mail.example.com or call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" see https://ex.example.org/u/"), did, lit(" now."))
    val redacted = regexp_replace(regexp_replace(regexp_replace(full,
      "https?://[A-Za-z0-9._/-]+", "[URL]"),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
      "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "[PHONE]")
    val residual = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(redacted.as("r"))
      .filter(col("r").rlike("@|https?://|\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"))
      .count()
    assert(residual == 0, s"$residual docs still carry PII after redaction")
  }

  test("t11: zipf slope is negative (frequency decreases with rank)") {
    val r = q("t11_zipf_slope").collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) > 2)
    assert(r(0).getDouble(1) < 0.0, s"slope ${r(0).getDouble(1)} not negative")
  }

  test("d11: exact prefix filtering finds every pair the probabilistic LSH finds") {
    val viaPrefix = q("d11_prefix_filter_pairs")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = graft.SparkEntry.queries("d4_minhash_pairs")(spark, Sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPrefix.nonEmpty)
    assert(viaLsh.subsetOf(viaPrefix),
      s"LSH found pairs prefix filtering missed: ${viaLsh.diff(viaPrefix)}")
  }

  test("m6: every media picks a frame 0..3 with a positive byte diversity") {
    val rows = q("m6_keyframe").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 3)
      assert(r.getInt(2) > 0)
    }
  }

  test("q57: bands cover all orders and stay inside [0, 19]") {
    val rows = q("q57_histogram").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.t(spark, Sf, "orders").count())
    rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 19)
      assert(r.getDouble(3) <= r.getDouble(4))
    }
  }

  test("q56: count-min estimates never undercount and are near-exact here") {
    val rows = q("q56_cms_counts").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted ${r.getString(0)}: $est < $exact")
      assert(r.getLong(3) == est - exact)
    }
  }

  test("q52: one row per (flag, measure); discount mean stays a fraction") {
    val rows = q("q52_unpivot").collect()
    assert(rows.length == 9)
    rows.filter(_.getString(1) == "l_discount").foreach { r =>
      val mean = r.getDouble(4)
      assert(mean > 0.0 && mean < 1.0, s"discount mean $mean out of range")
    }
  }

  test("q53: lateral top-3 equals the window-function formulation") {
    val lateral = q("q53_lateral_topn")
      .select("n_name", "c_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val viaWindow = Tables.t(spark, Sf, "customer")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .join(Tables.t(spark, Sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(lateral == viaWindow)
  }

  test("q54: islands partition the orders; adjacent islands change status") {
    val out = q("q54_status_islands").persist()
    val totalOrders = Tables.t(spark, Sf, "orders").count()
    val coveredOrders = out.agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(coveredOrders == totalOrders,
      s"islands cover $coveredOrders of $totalOrders orders")
    // Within a customer, consecutive islands must carry different
    // statuses — otherwise the compaction left a mergeable run split.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("island")
    val mergeable = out
      .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev_status") === col("o_orderstatus"))
      .count()
    out.unpersist()
    assert(mergeable == 0, s"$mergeable adjacent islands share a status")
  }

  test("q60: observed points pass through; gaps stay inside neighbor bounds") {
    val rows = q("q60_interpolate").collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble,
        s"observed day reinterpolated: $r")
      assert(r.getBoolean(4))
    }
    // Per-series: every interpolated value must lie within the series'
    // observed min/max (linear interpolation never extrapolates).
    rows.groupBy(_.getLong(0)).foreach { case (_, series) =>
      val obs = series.filter(!_.isNullAt(2)).map(_.getLong(2).toDouble)
      if (obs.nonEmpty) {
        val (lo, hi) = (obs.min, obs.max)
        series.filter(_.isNullAt(2)).foreach { r =>
          val v = r.getDouble(3)
          assert(v >= lo - 1e-9 && v <= hi + 1e-9,
            s"interpolated $v escapes [$lo, $hi]")
          assert(!r.getBoolean(4))
        }
      }
    }
  }

  test("q61: funnel stages shrink monotonically and the lag is positive") {
    val r = q("q61_funnel").collect()(0)
    val (s, v, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s >= v && v >= p && p > 0, s"funnel $s >= $v >= $p violated")
    assert(r.getDouble(3) > 0.0)
  }

  test("q58: the XML render→parse loop loses nothing vs the direct path") {
    val viaXml = q("q58_xml_ingest").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val direct = Tables.t(spark, Sf, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("s"),
        min(col("o_orderkey")).as("mk"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(viaXml == direct)
  }

  test("q59: lambda results agree with plain aggregations") {
    val rows = q("q59_hof_funcs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0)
      assert(r.getLong(2) > 0, "token lengths must sum positive")
    }
    // spot-check sum_len: total chars == text length minus separators
    val direct = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        (length(col("text")) - (size(split(col("text"), " ")) - 1))
          .cast("long").as("expected"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == direct(r.getLong(0)),
      s"doc ${r.getLong(0)}: sum_len ${r.getLong(2)} != ${direct(r.getLong(0))}"))
  }

  test("q54 equals an independent run-compaction fold over the sorted orders") {
    val got = q("q54_status_islands")
      .select(col("o_custkey"), col("island"), col("o_orderstatus"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("n_orders"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5))).toSet
    val orders = Tables.t(spark, Sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").cast("string").as("ts_s"),
        col("o_orderdate").cast("date").cast("string").as("d"))
      .collect()
    val expected = orders.groupBy(_.getLong(0)).flatMap { case (ck, rows) =>
      // ISO timestamp strings sort identically to the timestamps
      val sorted = rows.sortBy(r => (r.getString(3), r.getLong(1)))
      // compact consecutive same-status runs, numbering islands from 1
      val runs = sorted.foldLeft(List.empty[List[org.apache.spark.sql.Row]]) {
        case (acc, r) => acc match {
          case head :: tail if head.head.getString(2) == r.getString(2) =>
            (r :: head) :: tail
          case _ => List(r) :: acc
        }
      }.reverse
      runs.zipWithIndex.map { case (run, idx) =>
        val dates = run.map(_.getString(4))
        (ck, (idx + 1).toLong, run.head.getString(2),
          dates.min, dates.max, run.size.toLong)
      }
    }.toSet
    assert(got == expected)
  }

  test("q55: ORC round-trip preserves the slice exactly") {
    val viaOrc = q("q55_orc_roundtrip").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = Tables.t(spark, Sf, "lineitem")
      .filter(col("l_quantity") <= 5)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sq"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(viaOrc == direct)
  }
}
