package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-phase scan must agree EXACTLY with the single-window
  * formulation (`SUM OVER (ORDER BY k)`) it replaces — on randomized
  * inputs, any partition count, including tied order keys (default
  * RANGE frame: ties share the total).
  */
class GlobalPrefixSumSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def singleWindow(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    // sequential model: ties aggregate together (RANGE frame)
    val byKey = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val keys = byKey.keys.toSeq.sorted
    val cums = keys.scanLeft(0L)(_ + byKey(_)).tail
    keys.zip(cums).toMap
  }

  test("large frame: rank agrees with row_number (one-materialization pin)") {
    // Regression: `ranged` feeds both the totals branch and the main
    // branch; before the persist barrier each branch re-executed
    // repartitionByRange with a different sampling seed and could draw
    // DIFFERENT range boundaries — offsets for a partitioning the main
    // branch didn't have. Small frames rarely diverged; ~60k rows make
    // the drift reliable, so this pin runs at sf0.01 scale.
    import org.apache.spark.sql.expressions.Window
    val vals = spark.read
      .parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_extendedprice").as("v"), col("l_orderkey"),
        col("l_linenumber"))
    val ranked = GlobalPrefixSum.withRunningTotalBy(
      vals.withColumn("one", lit(1L)),
      struct(col("v").as("s"), col("l_orderkey").as("k1"),
        col("l_linenumber").as("k2")), "one", "rnk")
    val rn = vals.withColumn("rn", row_number().over(
      Window.orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
    val mismatches = ranked
      .join(rn, Seq("v", "l_orderkey", "l_linenumber"))
      .filter(col("rnk") =!= col("rn")).count()
    assert(mismatches === 0L)
    spark.catalog.clearCache()
  }

  test("matches the single-window model on randomized data, any width") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 50 + rnd.nextInt(200)
      // ~20% duplicate keys to exercise the tie semantics
      val rows = (0 until n).map { _ =>
        (rnd.nextInt(n / 3).toLong, rnd.nextInt(1000).toLong)
      }
      val parts = 1 + rnd.nextInt(8)
      val got = GlobalPrefixSum
        .withRunningTotal(rows.toDF("k", "v"), "k", "v", "cum", parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = singleWindow(rows)
      assert(got.length === n)
      got.foreach { case (k, _, cum) =>
        assert(cum === want(k), s"trial $trial key $k (parts=$parts)")
      }
    }
  }

  test("d16 packing: sequences fill to capacity; crossing flags are consistent") {
    val out = graft.SparkEntry
      .queries("d16_sequence_packing")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val cap = graft.queries.TextOps5.SeqCap
    var prevCum = 0L
    out.foreach { r =>
      val (nTok, cum) = (r.getLong(1), r.getLong(2))
      val (first, last, crosses) = (r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(cum === prevCum + nTok, "cum must chain exactly")
      assert(first === (cum - nTok) / cap && last === (cum - 1) / cap)
      assert(crosses === (first != last))
      prevCum = cum
    }
    // every interior sequence is filled exactly to capacity by construction
    val totalTok = out.map(_.getLong(1)).sum
    assert(out.last.getLong(4) === (totalTok - 1) / cap)
  }

  test("d18 curriculum: shards are contiguous token ranges in quality order") {
    val out = graft.SparkEntry
      .queries("d18_curriculum_shards")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.nonEmpty)
    // walk docs in curriculum order (ttr desc, doc_id): shard ids must be
    // non-decreasing and each shard's token mass ≈ 512 (± one doc)
    val cur = out.sortBy { case (id, _, ttr, _) => (-ttr, id) }
    var prevShard = 0L
    var tokInShard = 0L
    cur.foreach { case (id, nTok, _, shard) =>
      assert(shard >= prevShard, s"doc $id shard $shard after $prevShard")
      if (shard != prevShard) { prevShard = shard; tokInShard = 0L }
      tokInShard += nTok
    }
    val shardTotals = cur.groupBy(_._4).view.mapValues(_.map(_._2).sum)
    shardTotals.toSeq.sortBy(_._1).dropRight(1).foreach { case (s, tot) =>
      assert(tot >= 512 - cur.map(_._2).max && tot < 512 + cur.map(_._2).max,
        s"shard $s holds $tot tokens")
    }
  }

  test("q79: splits partition the corpus with zero group leakage") {
    val out = graft.SparkEntry
      .queries("q79_group_split")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty && out.length <= 3)
    assert(out.forall(_.getLong(4) === 0L), "leaky sources must be 0")
    val docs = graft.queries.Tables
      .t(spark, "/root/testdata/sf0.001", "documents").count()
    assert(out.map(_.getLong(1)).sum === docs, "splits must cover all docs")
  }

  test("q80: quotas sum to the budget when capping binds; rates in (0,1]") {
    val out = graft.SparkEntry
      .queries("q80_token_budget")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val budget = out.head.getLong(2).toDouble
    val quotaSum = out.map(_.getDouble(3)).sum
    // budget = total/2 < total, so the cap binds: Σ quota ≈ budget
    // (rounding each quota to 2 decimals drifts < n_sources cents)
    assert(math.abs(quotaSum - budget) <= out.length * 0.01 + 1e-6,
      s"quota sum $quotaSum vs budget $budget")
    out.foreach { r =>
      val rate = r.getDouble(4)
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getDouble(3) <= r.getLong(1).toDouble + 1e-9,
        "quota cannot exceed the source's tokens")
    }
  }
}
