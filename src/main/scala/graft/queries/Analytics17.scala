package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 19 (SURVEY.md §2.4):
  *
  *  - q130: Benford first-digit audit — the fraud/data-quality screen:
  *    first significant digit extracted from exact decimal cents via
  *    STRING head (no float log10 in the digit path), per-digit counts
  *    against the log10(1+1/d) Benford expectation (one identical
  *    ln-ratio per digit — the t9/t12 libm-parity precedent).
  *  - q131: price/volume revenue bridge — the finance waterfall
  *    decomposition between two shipment years, kept EXACT by scaling
  *    through q0 (the q123 device): price term = r1·q0 − r0·q1,
  *    volume term = r0·(q1 − q0); they sum to Δr·q0 by identity, so
  *    the decomposition replays bit-for-bit in decimal cents. Top-15
  *    parts by |Δr| via the bounded min-k aggregate.
  *  - m14: audio clipping QA — the m7 PCM surface turned into a
  *    defect detector: per-media clipped-sample fraction (|s| ≥
  *    32000) and the LONGEST clipped run via gaps-and-islands over
  *    the exploded sample index (bounded per-media partitions).
  *    Planted '~'-runs (0x7E7E = 32382) guarantee true positives
  *    whose run length both engines replay.
  */
object Analytics17 {
  import Tables.t

  private val ClipAt = 32000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_benford_audit" -> ((spark, dir) => {
      val digits = t(spark, dir, "orders")
        .select((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val totals = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(totals))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("frac"),
          round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6)
            .as("benford_frac"))
        .orderBy("digit")
    }),

    "q131_price_volume_bridge" -> ((spark, dir) => {
      def period(yr: Int, rc: String, qc: String) =
        t(spark, dir, "lineitem")
          .filter(year(col("l_shipdate")) === yr)
          .groupBy("l_partkey")
          // tight widths: (15,4)×(8,0) products stay inside BOTH
          // engines' 38-digit multiply limit with zero precision loss
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(14,4)").as(rc),
            sum(col("l_quantity").cast("long")).cast("decimal(8,0)").as(qc))
      val joined = period(1995, "r0", "q0")
        .join(period(1996, "r1", "q1"), "l_partkey")
        .filter(col("q0") > 0 && col("q1") > 0)
        .withColumn("delta_scaled",
          ((col("r1") - col("r0")) * col("q0")).cast("decimal(38,4)"))
        .withColumn("price_term",
          (col("r1") * col("q0") - col("r0") * col("q1"))
            .cast("decimal(38,4)"))
        .withColumn("volume_term",
          (col("r0") * (col("q1") - col("q0"))).cast("decimal(38,4)"))
      joined.groupBy()
        .agg(graft.functions.TopKAgg.minK(
          struct((-abs(col("delta_scaled"))).as("negd"),
            col("l_partkey").as("pk"), col("r0").as("r0"),
            col("r1").as("r1"), col("q0").as("q0"), col("q1").as("q1"),
            col("price_term").as("pt"), col("volume_term").as("vt"),
            col("delta_scaled").as("ds")), 15).as("w"))
        .select(explode(col("w")).as("m"))
        // decomposition is exact DECIMAL; present DOUBLE/BIGINT (no
        // decimal may reach a dumped column — driver parity)
        .select(col("m.pk").as("l_partkey"),
          col("m.r0").cast("double").as("rev_1995"),
          col("m.r1").cast("double").as("rev_1996"),
          col("m.q0").cast("long").as("qty_1995"),
          col("m.q1").cast("long").as("qty_1996"),
          col("m.pt").cast("double").as("price_term"),
          col("m.vt").cast("double").as("volume_term"),
          col("m.ds").cast("double").as("delta_scaled"))
        .orderBy((-abs(col("delta_scaled"))).asc, col("l_partkey"))
    }),

    "m14_audio_clipping" -> ((spark, dir) => {
      val base = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          when(col("doc_id") % 30 === 0,
            concat(col("text"), lit("~" * 40)))
            .otherwise(col("text")).as("text"))
      val m = base
        .select(col("media_id"),
          hex(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")).as("hx"),
          (octet_length(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")) / 2)
            .cast("long").as("n_smp"))
        .filter(col("n_smp") > 0)
      // explode the index FIRST, decode per exploded row (the m10/m11
      // lesson: interpreted per-element folds re-evaluate per row)
      val smp = m
        .select(col("media_id"), col("n_smp"), col("hx"),
          explode(expr("sequence(0L, n_smp - 1)")).as("i"))
        .withColumn("v", expr(
          """CASE WHEN CAST(conv(concat(
            |    substring(hx, CAST(i*4+3 AS INT), 2),
            |    substring(hx, CAST(i*4+1 AS INT), 2)), 16, 10) AS BIGINT)
            |  >= 32768
            |THEN CAST(conv(concat(
            |    substring(hx, CAST(i*4+3 AS INT), 2),
            |    substring(hx, CAST(i*4+1 AS INT), 2)), 16, 10) AS BIGINT)
            |  - 65536
            |ELSE CAST(conv(concat(
            |    substring(hx, CAST(i*4+3 AS INT), 2),
            |    substring(hx, CAST(i*4+1 AS INT), 2)), 16, 10) AS BIGINT)
            |END""".stripMargin))
        .withColumn("clipped", abs(col("v")) >= ClipAt)
      val wRun = Window.partitionBy("media_id").orderBy("i")
      val runs = smp.filter(col("clipped"))
        .withColumn("grp", col("i") - row_number().over(wRun))
        .groupBy("media_id", "grp").agg(count(lit(1)).as("run_len"))
        .groupBy("media_id").agg(max(col("run_len")).as("longest_run"))
      smp.groupBy("media_id", "n_smp")
        .agg(count_if(col("clipped")).as("n_clipped"))
        .join(runs, Seq("media_id"), "left")
        .select(col("media_id"), col("n_smp"), col("n_clipped"),
          round(col("n_clipped").cast("double") / col("n_smp"), 6)
            .as("clip_frac"),
          coalesce(col("longest_run"), lit(0L)).as("longest_run"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q130_benford_audit" ->
      """WITH cents AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM orders),
        |digits AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
        |    AS digit, CAST(count(*) AS BIGINT) AS n
        |  FROM cents WHERE cents > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM digits)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / total, 6) AS frac,
        |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_frac
        |FROM digits CROSS JOIN tot ORDER BY digit""".stripMargin,

    "q131_price_volume_bridge" ->
      """WITH p0 AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(14,4))
        |      AS r0,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS DECIMAL(8,0)) AS q0
        |  FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1),
        |p1 AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(14,4))
        |      AS r1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS DECIMAL(8,0)) AS q1
        |  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
        |j AS (
        |  SELECT l_partkey, r0, r1, q0, q1,
        |    CAST((r1 - r0) * q0 AS DECIMAL(38,4)) AS delta_scaled,
        |    CAST(r1 * q0 - r0 * q1 AS DECIMAL(38,4)) AS price_term,
        |    CAST(r0 * (q1 - q0) AS DECIMAL(38,4)) AS volume_term
        |  FROM p0 JOIN p1 USING (l_partkey)
        |  WHERE q0 > 0 AND q1 > 0)
        |SELECT l_partkey, CAST(r0 AS DOUBLE) AS rev_1995,
        |  CAST(r1 AS DOUBLE) AS rev_1996, CAST(q0 AS BIGINT) AS qty_1995,
        |  CAST(q1 AS BIGINT) AS qty_1996,
        |  CAST(price_term AS DOUBLE) AS price_term,
        |  CAST(volume_term AS DOUBLE) AS volume_term,
        |  CAST(delta_scaled AS DOUBLE) AS delta_scaled
        |FROM j
        |ORDER BY abs(delta_scaled) DESC, l_partkey LIMIT 15""".stripMargin,

    "m14_audio_clipping" ->
      s"""WITH base AS (
         |  SELECT doc_id AS media_id,
         |    CASE WHEN doc_id % 30 = 0 THEN text || repeat('~', 40)
         |      ELSE text END AS text
         |  FROM documents WHERE text IS NOT NULL),
         |m AS (
         |  SELECT media_id, hex(encode(text || 'ÿÿ')) AS hx,
         |    octet_length(encode(text || 'ÿÿ')) // 2 AS n_smp
         |  FROM base WHERE octet_length(encode(text || 'ÿÿ')) >= 2),
         |raw AS (
         |  SELECT media_id, n_smp, r.i AS i,
         |    CAST(concat('0x', substr(hx, CAST(r.i*4+3 AS BIGINT), 2),
         |      substr(hx, CAST(r.i*4+1 AS BIGINT), 2)) AS BIGINT) AS rv
         |  FROM m, UNNEST(range(n_smp)) AS r(i)),
         |smp AS (
         |  SELECT media_id, n_smp, i,
         |    CASE WHEN rv >= 32768 THEN rv - 65536 ELSE rv END AS v
         |  FROM raw),
         |clip AS (
         |  SELECT media_id, i,
         |    i - row_number() OVER (PARTITION BY media_id ORDER BY i) AS grp
         |  FROM smp WHERE abs(v) >= $ClipAt),
         |runs AS (
         |  SELECT media_id, CAST(max(run_len) AS BIGINT) AS longest_run
         |  FROM (SELECT media_id, grp, count(*) AS run_len
         |        FROM clip GROUP BY 1, 2) GROUP BY 1),
         |agg AS (
         |  SELECT media_id, n_smp,
         |    CAST(count(*) FILTER (WHERE abs(v) >= $ClipAt) AS BIGINT)
         |      AS n_clipped
         |  FROM smp GROUP BY 1, 2)
         |SELECT agg.media_id, n_smp, n_clipped,
         |  round(CAST(n_clipped AS DOUBLE) / n_smp, 6) AS clip_frac,
         |  coalesce(longest_run, 0) AS longest_run
         |FROM agg LEFT JOIN runs ON agg.media_id = runs.media_id
         |ORDER BY agg.media_id""".stripMargin,
  )
}
