package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 118 (SURVEY.md §2.4):
  *
  *  - q278: Haar wavelet decomposition of the monthly revenue series —
  *    the multi-resolution signal view (trend + per-scale detail).
  *    The fact scan collapses to integer revenue cents per month
  *    FIRST; the 4 dyadic levels then run on a 16-row SF-independent
  *    frame as pairwise sum/difference aggregations (exact integers
  *    throughout — the 1/2^level normalization happens only in the
  *    final double rendering, where dividing by a power of two is
  *    IEEE-exact).
  *  - q279: decision-stump training — the best single totalprice split
  *    for "order is high priority": per candidate threshold, split
  *    counts come from ONE map-side-combinable aggregation pass
  *    (count_if per threshold), weighted Gini impurity from exact
  *    integers in identically-rendered double arithmetic, argmin via
  *    the bounded min-k aggregate with a threshold tiebreak.
  *  - q280: naive Bayes classifier — train P(type) and the
  *    Laplace-smoothed P(hour-bucket|type), P(value-bucket|type) on
  *    even-keyed users' events, score odd-keyed events via summed
  *    log-probabilities (each term rounded→DECIMAL(18,9) so the sums
  *    are exact and order-free), argmax with a type tiebreak, report
  *    per-class accuracy. Unseen feature values fall back to the
  *    smoothed-zero term through coalesce — never dropped rows.
  */
object Analytics101 {
  import Tables.t

  private val Thresholds: Seq[Int] =
    Seq(50000, 100000, 150000, 200000, 250000, 300000, 350000, 400000)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q278_haar" -> ((spark, dir) => {
      // o_totalprice is a parquet DOUBLE: summing doubles is
      // order-dependent across engines, so quantize to integer cents
      // PER ROW and sum longs — exact and order-free.
      val monthly = t(spark, dir, "orders")
        .groupBy(trunc(col("o_orderdate"), "month").as("mon"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      // 16 earliest months, indexed 0..15 — a bounded SF-independent
      // frame (the order calendar, not the fact table), so the global
      // window is a ~80-row sort.
      val base = monthly
        .withColumn("idx", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("mon")) - 1)
        .filter(col("idx") < 16)
        .select(col("idx").cast("long").as("idx"), col("cents"))
        .localCheckpoint(true)
      var approx = base
      var out: DataFrame = null
      for (lvl <- 1 to 4) {
        val paired = approx.groupBy((col("idx") / 2).cast("long").as("idx"))
          .agg(sum(col("cents")).as("s"),
            sum(when(col("idx") % 2 === 0, col("cents"))
              .otherwise(-col("cents"))).as("d"))
          .localCheckpoint(true) // feeds next level + the detail output
        val details = paired.select(lit(lvl).as("level"), col("idx"),
          lit("detail").as("kind"),
          round(col("d").cast("double")
            / math.pow(2.0, lvl.toDouble) / 100, 6).as("coeff"))
        out = if (out == null) details else out.union(details)
        approx = paired.select(col("idx"), col("s").as("cents"))
      }
      val top = approx.select(lit(4).as("level"), col("idx"),
        lit("approx").as("kind"),
        round(col("cents").cast("double") / 16 / 100, 6).as("coeff"))
      out.union(top).orderBy("level", "kind", "idx")
    }),

    "q279_stump" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_totalprice").as("v"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("pos"))
      // One pass: per-threshold left-side counts + global totals.
      val aggs = Seq(count(lit(1)).as("n"), count_if(col("pos")).as("np")) ++
        Thresholds.flatMap(th => Seq(
          count_if(col("v") <= th).as(s"nl_$th"),
          count_if(col("v") <= th && col("pos")).as(s"npl_$th")))
      val wide = o.agg(aggs.head, aggs.tail: _*)
      def gini(nStr: String, pStr: String): String =
        s"""(CASE WHEN $nStr = 0 THEN cast(0.0 as double)
           |  ELSE 1.0 - (CAST($pStr AS DOUBLE) / $nStr)
           |             * (CAST($pStr AS DOUBLE) / $nStr)
           |       - (CAST($nStr - $pStr AS DOUBLE) / $nStr)
           |         * (CAST($nStr - $pStr AS DOUBLE) / $nStr) END)"""
          .stripMargin
      val perTh = Thresholds.map { th =>
        val wg =
          s"""((CAST(nl_$th AS DOUBLE) * ${gini(s"nl_$th", s"npl_$th")}
             | + CAST(n - nl_$th AS DOUBLE)
             |   * ${gini(s"(n - nl_$th)", s"(np - npl_$th)")}) / n)"""
            .stripMargin
        struct(expr(wg).as("wg"), lit(th).as("th"),
          col(s"nl_$th").as("n_left"), col(s"npl_$th").as("np_left"))
      }
      wide
        .select(col("n"), col("np"),
          expr(gini("n", "np")).as("gini_root"),
          least(perTh: _*).as("b"))
        .select(col("n").as("n_orders"), col("np").as("n_pos"),
          round(col("gini_root"), 6).as("gini_root"),
          col("b")("th").as("best_threshold"),
          round(col("b")("wg"), 6).as("gini_split"),
          round(col("gini_root") - col("b")("wg"), 6).as("gain"),
          col("b")("n_left").as("n_left"),
          col("b")("np_left").as("np_left"))
    }),

    "q280_naive_bayes" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("event_id"),
          col("event_type").as("y"), hour(col("ts")).as("hb"),
          floor(col("value") / 50).cast("long").as("vb"))
        .localCheckpoint(true) // train/test splits + vocabulary scans
      val train = ev.filter(col("user_id") % 2 === 0)
      val prior = train.groupBy("y").agg(count(lit(1)).as("ny"))
        .localCheckpoint(true)
      val vocabH = train.agg(countDistinct(col("hb")).as("vh"))
      val vocabV = train.agg(countDistinct(col("vb")).as("vv"))
      def cpt(feat: String, vocab: DataFrame, vCol: String): DataFrame =
        train.groupBy("y", feat)
          .agg(count(lit(1)).as("c"))
          .join(broadcast(prior), "y")
          .crossJoin(broadcast(vocab))
          .select(col("y"), col(feat),
            expr(s"cast(round(ln(cast(c + 1 as double) / (ny + $vCol)), 9) " +
              "as decimal(18,9))").as(s"lp_$feat"))
      val cptH = cpt("hb", vocabH, "vh")
      val cptV = cpt("vb", vocabV, "vv")
      // Smoothed-zero fallback per class: ln(1 / (ny + V)).
      def zero(vocab: DataFrame, vCol: String, name: String): DataFrame =
        prior.crossJoin(broadcast(vocab))
          .select(col("y"), expr(
            s"cast(round(ln(cast(1 as double) / (ny + $vCol)), 9) " +
              s"as decimal(18,9))").as(name))
      val zH = zero(vocabH, "vh", "z_hb")
      val zV = zero(vocabV, "vv", "z_vb")
      val nTrain = train.agg(count(lit(1)).as("nt"))
      val priorLp = prior.crossJoin(broadcast(nTrain))
        .select(col("y").as("cand"), expr(
          "cast(round(ln(cast(ny as double) / nt), 9) as decimal(18,9))")
          .as("lp_y"))
      // Every test event scores every candidate class: one fan-out by
      // the |classes|-row prior frame, feature log-probs looked up via
      // broadcast left joins with the smoothed-zero fallback.
      val scored = ev.filter(col("user_id") % 2 === 1)
        .select(col("event_id"), col("y").as("actual"), col("hb"),
          col("vb"))
        .crossJoin(broadcast(priorLp))
        .join(broadcast(cptH.withColumnRenamed("y", "cand")),
          Seq("cand", "hb"), "left")
        .join(broadcast(cptV.withColumnRenamed("y", "cand")),
          Seq("cand", "vb"), "left")
        .join(broadcast(zH.withColumnRenamed("y", "cand")), "cand")
        .join(broadcast(zV.withColumnRenamed("y", "cand")), "cand")
        .select(col("event_id"), col("actual"), col("cand"),
          (col("lp_y") + coalesce(col("lp_hb"), col("z_hb"))
            + coalesce(col("lp_vb"), col("z_vb"))).as("score"))
      // argmax score per event (ties -> lexicographically smaller type).
      val pred = scored.groupBy("event_id", "actual")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("score")).as("ns"), col("cand")), 1).as("w"))
        .select(col("actual"), col("w")(0)("cand").as("predicted"))
      pred.groupBy("actual")
        .agg(count(lit(1)).as("n_test"),
          count_if(col("predicted") === col("actual")).as("n_correct"))
        .select(col("actual"), col("n_test"), col("n_correct"),
          round(col("n_correct").cast("double") / col("n_test"), 6)
            .as("accuracy"))
        .orderBy("actual")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q278_haar" -> """
      WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
          sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1),
      base AS (
        SELECT CAST(row_number() OVER (ORDER BY mon) - 1 AS BIGINT) AS idx,
          cents
        FROM monthly QUALIFY idx < 16),
      l1 AS (SELECT idx // 2 AS idx, sum(cents) AS s,
               sum(CASE WHEN idx % 2 = 0 THEN cents ELSE -cents END) AS d
             FROM base GROUP BY 1),
      l2 AS (SELECT idx // 2 AS idx, sum(s) AS s,
               sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS d
             FROM l1 GROUP BY 1),
      l3 AS (SELECT idx // 2 AS idx, sum(s) AS s,
               sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS d
             FROM l2 GROUP BY 1),
      l4 AS (SELECT idx // 2 AS idx, sum(s) AS s,
               sum(CASE WHEN idx % 2 = 0 THEN s ELSE -s END) AS d
             FROM l3 GROUP BY 1)
      SELECT level, idx, kind, coeff FROM (
        SELECT 1 AS level, idx, 'detail' AS kind,
          round(CAST(d AS DOUBLE) / 2 / 100, 6) AS coeff FROM l1
        UNION ALL
        SELECT 2, idx, 'detail',
          round(CAST(d AS DOUBLE) / 4 / 100, 6) FROM l2
        UNION ALL
        SELECT 3, idx, 'detail',
          round(CAST(d AS DOUBLE) / 8 / 100, 6) FROM l3
        UNION ALL
        SELECT 4, idx, 'detail',
          round(CAST(d AS DOUBLE) / 16 / 100, 6) FROM l4
        UNION ALL
        SELECT 4, idx, 'approx',
          round(CAST(s AS DOUBLE) / 16 / 100, 6) FROM l4)
      ORDER BY level, kind, idx""",

    "q279_stump" -> {
      def gini(nStr: String, pStr: String): String =
        s"""(CASE WHEN $nStr = 0 THEN CAST(0.0 AS DOUBLE)
           |  ELSE 1.0 - (CAST($pStr AS DOUBLE) / $nStr)
           |             * (CAST($pStr AS DOUBLE) / $nStr)
           |       - (CAST($nStr - $pStr AS DOUBLE) / $nStr)
           |         * (CAST($nStr - $pStr AS DOUBLE) / $nStr) END)"""
          .stripMargin
      val leftCounts = Thresholds.map { th =>
        s"""CAST(count(*) FILTER (WHERE o_totalprice <= $th) AS BIGINT)
           |  AS nl_$th,
           |CAST(count(*) FILTER (WHERE o_totalprice <= $th AND pos)
           |  AS BIGINT) AS npl_$th""".stripMargin
      }.mkString(",\n")
      val rows = Thresholds.map { th =>
        s"""SELECT n, np, gini_root, $th AS th,
           |  ((CAST(nl_$th AS DOUBLE) * ${gini(s"nl_$th", s"npl_$th")}
           |    + CAST(n - nl_$th AS DOUBLE)
           |      * ${gini(s"(n - nl_$th)", s"(np - npl_$th)")}) / n)
           |    AS wg,
           |  nl_$th AS n_left, npl_$th AS np_left
           |FROM wide""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""
      WITH o AS (
        SELECT o_totalprice,
          o_orderpriority IN ('1-URGENT', '2-HIGH') AS pos
        FROM orders),
      wide AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS np,
          ${gini("CAST(count(*) AS BIGINT)",
            "CAST(count(*) FILTER (WHERE pos) AS BIGINT)")} AS gini_root,
          $leftCounts
        FROM o),
      cand AS ($rows),
      best AS (
        SELECT * FROM cand ORDER BY wg, th LIMIT 1)
      SELECT n AS n_orders, np AS n_pos,
        round(gini_root, 6) AS gini_root,
        th AS best_threshold,
        round(wg, 6) AS gini_split,
        round(gini_root - wg, 6) AS gain,
        n_left, np_left
      FROM best"""
    },

    "q280_naive_bayes" -> """
      WITH ev AS (
        SELECT user_id, event_id, event_type AS y,
          CAST(hour(ts) AS INTEGER) AS hb,
          CAST(floor(value / 50) AS BIGINT) AS vb
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      train AS (SELECT * FROM ev WHERE user_id % 2 = 0),
      prior AS (
        SELECT y, CAST(count(*) AS BIGINT) AS ny FROM train GROUP BY y),
      vh AS (SELECT CAST(count(DISTINCT hb) AS BIGINT) AS vh FROM train),
      vv AS (SELECT CAST(count(DISTINCT vb) AS BIGINT) AS vv FROM train),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM train),
      cpth AS (
        SELECT y, hb,
          CAST(round(ln(CAST(count(*) + 1 AS DOUBLE) / (ny + vh)), 9)
            AS DECIMAL(18,9)) AS lp_hb
        FROM train JOIN prior USING (y), vh
        GROUP BY y, hb, ny, vh),
      cptv AS (
        SELECT y, vb,
          CAST(round(ln(CAST(count(*) + 1 AS DOUBLE) / (ny + vv)), 9)
            AS DECIMAL(18,9)) AS lp_vb
        FROM train JOIN prior USING (y), vv
        GROUP BY y, vb, ny, vv),
      zh AS (
        SELECT y, CAST(round(ln(CAST(1 AS DOUBLE) / (ny + vh)), 9)
          AS DECIMAL(18,9)) AS z_hb
        FROM prior, vh),
      zv AS (
        SELECT y, CAST(round(ln(CAST(1 AS DOUBLE) / (ny + vv)), 9)
          AS DECIMAL(18,9)) AS z_vb
        FROM prior, vv),
      priorlp AS (
        SELECT y AS cand,
          CAST(round(ln(CAST(ny AS DOUBLE) / nt), 9) AS DECIMAL(18,9))
            AS lp_y
        FROM prior, nt),
      scored AS (
        SELECT t.event_id, t.y AS actual, p.cand,
          p.lp_y + coalesce(ch.lp_hb, zh.z_hb)
            + coalesce(cv.lp_vb, zv.z_vb) AS score
        FROM ev t
        CROSS JOIN priorlp p
        LEFT JOIN cpth ch ON ch.y = p.cand AND ch.hb = t.hb
        LEFT JOIN cptv cv ON cv.y = p.cand AND cv.vb = t.vb
        JOIN zh ON zh.y = p.cand
        JOIN zv ON zv.y = p.cand
        WHERE t.user_id % 2 = 1),
      pred AS (
        SELECT actual, cand AS predicted FROM (
          SELECT actual, cand, event_id,
            row_number() OVER (PARTITION BY event_id
              ORDER BY score DESC, cand) AS rn
          FROM scored)
        WHERE rn = 1)
      SELECT actual, CAST(count(*) AS BIGINT) AS n_test,
        CAST(count(*) FILTER (WHERE predicted = actual) AS BIGINT)
          AS n_correct,
        round(CAST(count(*) FILTER (WHERE predicted = actual) AS DOUBLE)
          / count(*), 6) AS accuracy
      FROM pred GROUP BY actual ORDER BY actual""",
  )
}
