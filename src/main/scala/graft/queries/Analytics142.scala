package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Round-7 additions, batch 142 (SURVEY.md §2.4):
  *
  *  - q355: HILBERT-curve clustering — the stronger space-filling curve
  *    (no diagonal quadrant jumps, so bounding boxes are tighter than
  *    the Z-curve's on the same data; Round11cSpec measures exactly
  *    that). The per-level rotate/reflect state machine has no closed
  *    bitwise form, so it runs as the fused codegen'd
  *    [[graft.functions.Hilbert2]] expression — a Column-tree unroll
  *    would triple in size per level. The oracle replays all 12 levels
  *    as generated chained CTEs, so the hash match pins the exact
  *    curve, rotation-by-rotation. Same 64-bucket rollup as q352 for a
  *    like-for-like layout comparison.
  *  - t61: Good–Turing frequency-of-frequencies — the smoothing table
  *    (Gale & Sampson's r → (r+1)·N_{r+1}/N_r adjusted counts) an LM
  *    pipeline derives unseen-mass estimates from. Two aggregations:
  *    corpus → bigram counts → count-of-counts (the second is
  *    vocab-sized), then a self-join on r+1 — emitted as exact integer
  *    numerators (gt_num = (r+1)·N_{r+1}) against N_r and the token
  *    total, so no cross-engine division ever happens; the unseen-mass
  *    estimate is n_1/n_total read straight off the r=1 row.
  *  - q356: schema evolution across file generations — a corpus that
  *    lives for years accretes columns, and the reader must union old
  *    and new files without a rewrite. Two parquet generations are
  *    written (epoch 1: key+quantity; epoch 2 adds discount cents),
  *    read back through `mergeSchema`, and rolled up with the widened
  *    column NULL for pre-widening rows. The oracle recomputes every
  *    figure from the lineitem source, so the hash match proves the
  *    merged read neither drops rows nor invents values for the
  *    missing column.
  *  - q357: XML round-trip — Spark 4's native XML source/sink as
  *    another interchange format (config feeds, vendor drops). An
  *    orders slice is written as `<order>` rows and read back with
  *    schema inference; the oracle recomputes the rollup from the
  *    parquet original, so the hash match proves values, statuses and
  *    longs survive the XML encode/decode.
  */
object Analytics142 {
  import Tables.t

  private val HBits = 12
  private val HBuckets = 64L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q355_hilbert_cluster" -> ((spark, dir) => {
      val pts = t(spark, dir, "orders")
        .select(pmod(col("o_custkey"), lit(1 << HBits)).cast("long")
          .as("px"),
          pmod(datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")), lit(1 << HBits)).cast("long")
            .as("py"))
      val span = (1L << (2 * HBits)) / HBuckets
      pts
        .withColumn("hval", ZOrder.hilbert2(col("px"), col("py"), HBits))
        .withColumn("bucket", expr(s"hval div $span"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col("px")).as("min_x"), max(col("px")).as("max_x"),
          min(col("py")).as("min_y"), max(col("py")).as("max_y"))
        .withColumn("box_area",
          (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
        .orderBy("bucket")
    }),

    "t61_good_turing" -> ((spark, dir) => {
      // the unit is the word BIGRAM: the synthetic corpus has a ~31-word
      // vocabulary where every unigram is frequent, but bigrams show the
      // long tail (singletons, doubletons) Good–Turing exists for
      val freqs = t(spark, dir, "documents")
        .select(expr("regexp_extract_all(text, '[a-z]+', 0)").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(ws) - 1)," +
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("w"))
        .groupBy("w").agg(count(lit(1)).as("r"))
      val cofc = freqs.groupBy("r").agg(count(lit(1)).as("n_r"))
        .localCheckpoint(true) // vocab-sized; reused three times below
      val totals = cofc.agg(sum(col("r") * col("n_r")).as("n_total"))
      cofc.filter(col("r") <= 10)
        .join(cofc.select((col("r") - 1).as("r"),
          col("n_r").as("n_next")), Seq("r"), "left")
        .crossJoin(broadcast(totals))
        .select(col("r"), col("n_r"),
          ((col("r") + 1) * coalesce(col("n_next"), lit(0L)))
            .as("gt_num"),
          col("n_total"))
        .orderBy("r")
    }),

    "q356_schema_evolution" -> ((spark, dir) => {
      import java.nio.file.Paths
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q356", Paths.get(dir).getFileName.toString)
      val li = t(spark, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_quantity").cast("long").as("qty"),
          (col("l_discount").cast("decimal(18,4)") * 10000)
            .cast("long").as("disc_bp"))
      li.filter(col("l_orderkey") % 2 === 0)
        .select(col("l_orderkey"), col("qty"))
        .write.mode("overwrite").parquet(s"$base/epoch=1")
      li.filter(col("l_orderkey") % 2 === 1)
        .select(col("l_orderkey"), col("qty"), col("disc_bp"))
        .write.mode("overwrite").parquet(s"$base/epoch=2")
      spark.read.option("mergeSchema", "true").parquet(base.toString)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("qty")).as("sum_qty"),
          sum(when(col("disc_bp").isNull, 1L).otherwise(0L))
            .as("n_missing"),
          sum(coalesce(col("disc_bp"), lit(0L))).as("sum_disc_bp"))
    }),

    "q357_xml_roundtrip" -> ((spark, dir) => {
      import java.nio.file.Paths
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_q357", Paths.get(dir).getFileName.toString)
      t(spark, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("price_cents"))
        .write.mode("overwrite").option("rowTag", "order")
        .format("xml").save(base.toString)
      spark.read.format("xml").option("rowTag", "order")
        .load(base.toString)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price_cents")).as("sum_cents"),
          sum(col("o_custkey")).as("sum_cust"))
        .orderBy("o_orderstatus")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q355_hilbert_cluster" -> {
      val span = (1L << (2 * HBits)) / HBuckets
      s"""WITH pts AS (
         |  SELECT CAST(o_custkey % ${1 << HBits} AS BIGINT) AS px,
         |    CAST(CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
         |      AS BIGINT) % ${1 << HBits} AS BIGINT) AS py
         |  FROM orders),
         |h0 AS (
         |  SELECT px, py, CAST(0 AS BIGINT) AS hd, px AS hx, py AS hy
         |  FROM pts),
         |${ZOrder.hilbertLevelsSql("h0", HBits, Seq("px", "py"))}
         |SELECT hd // $span AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(px) AS min_x, max(px) AS max_x,
         |  min(py) AS min_y, max(py) AS max_y,
         |  (max(px) - min(px) + 1) * (max(py) - min(py) + 1) AS box_area
         |FROM hl$HBits GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "t61_good_turing" ->
      """WITH d AS (
        |  SELECT regexp_extract_all(text, '[a-z]+') AS ws
        |  FROM documents WHERE len(regexp_extract_all(text, '[a-z]+')) >= 2),
        |ix AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM d),
        |w AS (
        |  SELECT ws[CAST(i AS INTEGER)] || ' '
        |    || ws[CAST(i + 1 AS INTEGER)] AS w
        |  FROM ix),
        |f AS (SELECT w, count(*) AS r FROM w GROUP BY 1),
        |c AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
        |  FROM f GROUP BY 1),
        |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_total FROM c)
        |SELECT c.r, c.n_r,
        |  CAST((c.r + 1) * coalesce(nx.n_r, 0) AS BIGINT) AS gt_num,
        |  (SELECT n_total FROM tot) AS n_total
        |FROM c LEFT JOIN c nx ON nx.r = c.r + 1
        |WHERE c.r <= 10
        |ORDER BY c.r""".stripMargin,

    "q356_schema_evolution" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_missing,
        |  CAST(sum(CASE WHEN l_orderkey % 2 = 1 THEN
        |    CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS sum_disc_bp
        |FROM lineitem""".stripMargin,

    "q357_xml_roundtrip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders WHERE o_orderkey % 5 = 0
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
  )
}
