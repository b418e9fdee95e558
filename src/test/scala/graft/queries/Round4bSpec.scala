package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-4 second batch: stratified sampling,
  * equi-depth histograms, integer-exact PageRank, PMI collocations, the
  * quality filter, cluster-canonical keep lists, and duplicate-span
  * statistics.
  */
class Round4bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q62: strata keep their target rates and counts are consistent") {
    val rows = q("q62_stratified_sample").collect()
    assert(rows.map(_.getString(0)).toSet == Set("F", "O", "P"))
    val target = Map("F" -> 0.10, "O" -> 0.20, "P" -> 0.50)
    rows.foreach { r =>
      val (st, total, sampled) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(sampled >= 0 && sampled <= total)
      val rate = sampled.toDouble / total
      // md5 buckets are uniform; sf0.001 strata are 100s-of-rows small,
      // so allow a generous but still discriminating band
      assert(math.abs(rate - target(st)) < 0.12,
        s"stratum $st rate $rate far from ${target(st)}")
    }
  }

  test("q62: sampling is deterministic across runs") {
    val a = q("q62_stratified_sample").collect().map(_.toString).toSeq
    val b = q("q62_stratified_sample").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("q63: equi-depth bands are contiguous and roughly equal-mass") {
    val rows = q("q63_equidepth_hist").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val counts = rows.map(_.getLong(1))
    val total = counts.sum
    counts.foreach(c => assert(math.abs(c.toDouble / total - 0.25) < 0.02,
      s"band mass ${c.toDouble / total} not ~25%"))
    // bands must tile the value range: max of band i <= min of band i+1
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2),
        "band ranges overlap: equi-depth boundaries not respected")
    }
  }

  test("q64: rank mass is conserved and every nation is ranked") {
    val rows = q("q64_pagerank").collect()
    assert(rows.length == 25)
    val mass = rows.map(_.getLong(1)).sum
    // teleport 0.15 + damped 0.85; integer div truncation can only LOSE
    // mass, never create it
    assert(mass <= 1000000000000L && mass > 990000000000L,
      s"rank mass $mass out of band")
    rows.foreach(r => assert(r.getLong(1) > 0))
    // sorted descending by rank
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sorted.reverse)
  }

  test("t12: top collocation's bigram count matches a brute-force recount") {
    val rows = q("t12_pmi_bigrams").collect()
    assert(rows.length == 20)
    val pmis = rows.map(_.getDouble(3)).toSeq
    assert(pmis == pmis.sorted.reverse, "not ordered by pmi desc")
    assert(rows.forall(_.getLong(2) >= 3))
    val byName = q("t12_pmi_bigrams").select("w1", "w2", "cnt_b").collect().head
    val brute = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(posexplode(split(col("text"), " ")).as(Seq("pos", "term")),
        col("doc_id"))
      .withColumn("nxt", lead(col("term"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")))
      .filter(col("term") === byName.getString(0) &&
        col("nxt") === byName.getString(1))
      .count()
    assert(brute == byName.getLong(2),
      s"bigram (${byName.getString(0)}, ${byName.getString(1)}) count mismatch")
  }

  test("t13: attribution follows rule order and keep == no reason") {
    val rows = q("t13_quality_filter").collect()
    assert(rows.nonEmpty)
    val reasons = Set("too_short", "too_long", "low_diversity", "no_stopwords")
    var kept = 0
    rows.foreach { r =>
      val reason = Option(r.getString(4))
      val keep = r.getBoolean(5)
      assert(keep == reason.isEmpty)
      reason.foreach(x => assert(reasons.contains(x)))
      if (r.getInt(1) < 25)
        assert(reason.contains("too_short"), "rule precedence violated")
      if (keep) kept += 1
    }
    assert(kept > 0 && kept < rows.length, "filter should be discriminating")
  }

  test("d12: exactly one keeper per cluster, and keepers maximize content") {
    val rows = q("d12_keep_list").collect()
    val docs = Tables.t(spark, Sf, "documents").count()
    assert(rows.length == docs, "keep list must cover every document")
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cl, members) =>
      assert(members.count(_.getBoolean(2)) == 1,
        s"cluster $cl keeps ${members.count(_.getBoolean(2))} docs")
      assert(members.forall(_.getLong(3) == members.length),
        s"cluster $cl n_members inconsistent")
    }
    // multi-member clusters exist at this SF (d4 finds pairs), and they
    // drop everything but the keeper
    assert(byCluster.exists(_._2.length > 1))
  }

  test("t14: NFC composes exactly the planted marks on every doc") {
    // overlay plants 2 combining marks (composed away) + 1 angstrom
    // singleton (1 char before and after): every doc shrinks by exactly 2
    val rows = q("t14_unicode_nfc").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) - r.getInt(2) == 2,
        s"doc ${r.getLong(0)}: len ${r.getInt(1)} -> ${r.getInt(2)}")
    }
  }

  test("q66: pruned result equals the unpruned recompute") {
    import org.apache.spark.sql.functions._
    val got = q("q66_dynamic_pruning").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val o = Tables.t(spark, Sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val oddYears = o.groupBy("o_year").count()
      .filter(col("count") % 2 === 1)
      .collect().map(_.getInt(0)).toSet
    val want = o.filter(col("o_year").isin(oddYears.toSeq: _*))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("m7: energy/peak match a plain-Scala int16-LE decode of the payload") {
    val rows = q("m7_pcm_features").collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.t(spark, Sf, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect().take(25)
    docs.foreach { d =>
      val bytes = (d.getString(1) + "ÿÿ").getBytes("UTF-8")
      val n = bytes.length / 2
      val samples = (0 until n).map { i =>
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        val raw = lo + 256 * hi
        if (raw >= 32768) raw - 65536 else raw
      }
      val (gotN, gotE, gotP) = byId(d.getLong(0))
      assert(gotN == n)
      assert(gotE == samples.map(s => s.toLong * s).sum,
        s"doc ${d.getLong(0)} energy mismatch")
      assert(gotP == samples.map(s => math.abs(s).toLong).max)
    }
    // the UTF-8 ÿ overlay guarantees genuinely negative samples somewhere
    assert(rows.exists(_.getLong(3) > 32767 - 1) ||
      docs.exists { d =>
        val b = (d.getString(1) + "ÿÿ").getBytes("UTF-8")
        (0 until b.length / 2).exists(i => (b(2 * i + 1) & 0xff) >= 0x80)
      }, "sign branch never exercised")
  }

  test("q67: per-nation triangle counts match a brute-force recount") {
    import org.apache.spark.sql.functions._
    val got = q("q67_triangles").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rebuild the undirected nation graph in plain Scala
    val li = Tables.t(spark, Sf, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.t(spark, Sf, "orders").select("o_orderkey", "o_custkey")
    val s = Tables.t(spark, Sf, "supplier").select("s_suppkey", "s_nationkey")
    val c = Tables.t(spark, Sf, "customer").select("c_custkey", "c_nationkey")
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("s_nationkey").as("u"), col("c_nationkey").as("v"))
      .filter(col("u") =!= col("v"))
      .collect()
      .map(r => { val (a, b) = (r.getInt(0), r.getInt(1))
        (math.min(a, b), math.max(a, b)) }).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val names = Tables.t(spark, Sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val counts = collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    for (a <- nodes; b <- nodes if a < b && edges((a, b));
         cc <- nodes if b < cc && edges((b, cc)) && edges((a, cc))) {
      counts(a) += 1; counts(b) += 1; counts(cc) += 1
    }
    val want = counts.map { case (k, v) => names(k) -> v }.toMap
    assert(got == want, s"got $got\nwant $want")
  }

  test("t16: top merge pair matches a plain-Scala recount") {
    val rows = q("t16_bpe_merges").collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
    val top = rows.head
    val brute = Tables.t(spark, Sf, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .count(_ == top.getString(0))
    assert(brute == top.getLong(1),
      s"pair '${top.getString(0)}' recount $brute != ${top.getLong(1)}")
  }

  test("d14: every vector verdicted; d10 pair endpoints share a cluster") {
    val rows = q("d14_embedding_keep_list").collect()
    val nVecs = Tables.t(spark, Sf, "embeddings").count()
    assert(rows.length == nVecs, "keep list must cover every vector")
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(1)).foreach { case (cl, members) =>
      assert(members.count(_.getBoolean(2)) == 1,
        s"cluster $cl keeps ${members.count(_.getBoolean(2))}")
      assert(members.forall(_.getLong(3) == members.length))
    }
    val pairs = graft.SparkEntry.queries("d10_embedding_lsh_pairs")(spark, Sf)
      .select("a_id", "b_id").collect()
    assert(pairs.nonEmpty, "no near-dup pairs at this SF — test is vacuous")
    pairs.foreach { p =>
      assert(cluster(p.getLong(0)) == cluster(p.getLong(1)),
        s"pair ${p.getLong(0)},${p.getLong(1)} split across clusters")
    }
  }

  test("d15: funnel attrites monotonically and agrees with the standalone stages") {
    import org.apache.spark.sql.functions.col
    val rows = q("d15_corpus_pipeline").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (in, qk, dk, fin) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(in >= qk && qk >= dk && dk >= fin,
        s"${r.getString(0)} funnel not monotone: $in/$qk/$dk/$fin")
    }
    // cross-check stage 1 against the standalone t13 verdicts
    val qTotal = rows.map(_.getLong(2)).sum
    val t13Keeps = q("t13_quality_filter")
      .filter(col("doc_id") >= 100 && col("keep")).count()
    assert(qTotal == t13Keeps,
      s"pipeline quality keeps $qTotal != standalone t13 $t13Keeps")
    // cross-check stage 3 against the standalone d9 flags
    val d9Flagged = q("d9_contamination").count()
    val dropped23 = rows.map(r => r.getLong(3) - r.getLong(4)).sum
    assert(dropped23 <= d9Flagged,
      "decontamination dropped more docs than d9 flags")
  }

  test("d13: reported spans really occur in n_docs distinct documents") {
    val rows = q("d13_dup_spans").collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse)
    assert(counts.forall(_ >= 2))
    val top = rows.head
    val n = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull &&
        col("text").contains(top.getString(0)))
      .count()
    // contains() may over-count via cross-boundary matches, never under
    assert(n >= top.getLong(1),
      s"span claimed in ${top.getLong(1)} docs, found $n by substring scan")
  }
}
