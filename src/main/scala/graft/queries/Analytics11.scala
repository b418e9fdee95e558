package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 11 (SURVEY.md §2.4):
  *
  *  - q117: market-basket association rules — co-occurrence mining over
  *    order baskets: distinct (order, part) items, within-order pair
  *    counts (the self-join is co-partitioned on orderkey and each
  *    basket is bounded by the order's line count, so no quadratic
  *    blowup), global top-20 pairs through the bounded min-k aggregate,
  *    then support / confidence / lift from exact integer counts with
  *    one float division each. Item counts join onto the 20 survivors
  *    (broadcast), never the other way around.
  *  - q118: decile lift / gains table — the training-data-curation
  *    evaluation: customers ranked by account balance, labeled by
  *    1995 purchase activity, cut into 10 rank deciles via ONE
  *    GlobalPrefixSum scan (range-partitioned — no single-task global
  *    window), then per-decile capture rate and lift from exact
  *    integer counts. The 10-row cumulative window is bounded.
  *  - m12: image tile-grid plan — the vision-pipeline step between
  *    decode and patch embedding: a 64px tile grid with 16px overlap
  *    (stride 48) over each medium's decoded dimensions, last tiles
  *    clamped to the image edge. Tile indices explode AFTER the cheap
  *    per-row grid-shape math (integers only — no float parity
  *    surface), and the per-media report checksums every tile rect
  *    order-free.
  */
object Analytics11 {
  import Tables.t

  private val Tile = 64
  private val Stride = 48 // 16px overlap
  private val TopPairs = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_market_basket" -> ((spark, dir) => {
      val items = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val totals = items.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val b = items.select(col("l_orderkey").as("r_orderkey"),
        col("l_partkey").as("b_part"))
      // basket pairs: co-partitioned equi-join on orderkey; per-order
      // fan-out is bounded by the basket size (≤ line count per order)
      val pairCnt = items
        .join(b, col("l_orderkey") === col("r_orderkey") &&
          col("l_partkey") < col("b_part"))
        .groupBy(col("l_partkey").as("a_part"), col("b_part"))
        .agg(count(lit(1)).as("cnt_pair"))
      val top = pairCnt.groupBy()
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("cnt_pair")).as("negc"), col("a_part").as("a"),
            col("b_part").as("b")), TopPairs).as("w"))
        .select(explode(col("w")).as("m"))
        .select(col("m.a").as("a_part"), col("m.b").as("b_part"),
          (-col("m.negc")).as("cnt_pair"))
      val ic = items.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt_item"))
      top
        .join(ic.select(col("l_partkey").as("a_part"),
          col("cnt_item").as("cnt_a")), Seq("a_part"))
        .join(ic.select(col("l_partkey").as("b_part"),
          col("cnt_item").as("cnt_b")), Seq("b_part"))
        .crossJoin(broadcast(totals))
        .select(col("a_part"), col("b_part"), col("cnt_pair"),
          col("cnt_a"), col("cnt_b"),
          round(col("cnt_pair").cast("double") / col("n_orders"), 6)
            .as("support"),
          round(col("cnt_pair").cast("double") / col("cnt_a"), 6)
            .as("confidence"),
          round(col("cnt_pair").cast("double") * col("n_orders") /
            (col("cnt_a") * col("cnt_b")), 6).as("lift"))
        .orderBy(col("cnt_pair").desc, col("a_part"), col("b_part"))
    }),

    "q118_decile_lift" -> ((spark, dir) => {
      val labels = t(spark, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey")).distinct()
      val scored = t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .join(labels, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_acctbal"),
          when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("label"))
      val totals = scored.agg(count(lit(1)).as("total_n"),
        sum(col("label")).as("total_pos"))
      // global rank by balance desc via the range-partitioned prefix
      // sum (the unique custkey tiebreak makes the RANGE total an
      // exact row_number) — never a partition-less row_number window
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        scored.withColumn("one", lit(1L)),
        struct((-col("c_acctbal")).as("s"), col("c_custkey").as("k")),
        "one", "rn")
      val agg = ranked.crossJoin(broadcast(totals))
        .withColumn("decile", expr("((rn - 1) * 10) div total_n + 1"))
        .groupBy("decile", "total_n", "total_pos")
        .agg(count(lit(1)).as("n_cust"), sum(col("label")).as("n_pos"))
      // 10 rows by construction — the cumulative window is bounded
      agg
        .withColumn("cum_pos",
          sum(col("n_pos")).over(Window.orderBy("decile")))
        .select(col("decile"), col("n_cust"), col("n_pos"), col("cum_pos"),
          round(col("cum_pos").cast("double") / col("total_pos"), 6)
            .as("capture_rate"),
          round(col("n_pos").cast("double") * col("total_n") /
            (col("n_cust") * col("total_pos")), 6).as("lift"))
        .orderBy("decile")
    }),

    "m12_tile_grid" -> ((spark, dir) => {
      val grid = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          (octet_length(encode(col("text"), "UTF-8")) % 640 + 1)
            .as("width"),
          (octet_length(encode(col("text"), "UTF-8")) % 480 + 1)
            .as("height"))
        .withColumn("n_x", greatest(lit(1L),
          expr(s"CAST(width - ${Tile - Stride} + ${Stride - 1} AS BIGINT)" +
            s" div $Stride")))
        .withColumn("n_y", greatest(lit(1L),
          expr(s"CAST(height - ${Tile - Stride} + ${Stride - 1} AS BIGINT)" +
            s" div $Stride")))
      // grid shape first (cheap per-row ints), THEN the index explode;
      // rects decode as codegen'd integer exprs on the exploded stream
      grid
        .select(col("media_id"), col("width"), col("height"),
          col("n_x"), col("n_y"),
          explode(expr("sequence(0L, n_x * n_y - 1)")).as("i"))
        .withColumn("x0", least((col("i") % col("n_x")) * Stride,
          greatest(lit(0L), col("width").cast("long") - Tile)))
        .withColumn("y0", least(expr("i div n_x") * Stride,
          greatest(lit(0L), col("height").cast("long") - Tile)))
        .withColumn("x1", least(col("x0") + Tile, col("width").cast("long")))
        .withColumn("y1", least(col("y0") + Tile, col("height").cast("long")))
        .groupBy("media_id", "width", "height")
        .agg(max(col("n_x")).as("n_tiles_x"), max(col("n_y")).as("n_tiles_y"),
          count(lit(1)).as("n_tiles"),
          count_if(col("x1") - col("x0") === Tile &&
            col("y1") - col("y0") === Tile).as("n_full"),
          sum(col("x0") + lit(31L) * col("y0") + lit(997L) * col("x1") +
            lit(7919L) * col("y1")).as("coords_sum"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q117_market_basket" ->
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |tot AS (
         |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
         |  FROM items),
         |pairs AS (
         |  SELECT i1.l_partkey AS a_part, i2.l_partkey AS b_part,
         |    CAST(count(*) AS BIGINT) AS cnt_pair
         |  FROM items i1 JOIN items i2
         |    ON i1.l_orderkey = i2.l_orderkey
         |    AND i1.l_partkey < i2.l_partkey
         |  GROUP BY 1, 2),
         |top AS (
         |  SELECT a_part, b_part, cnt_pair FROM (
         |    SELECT *, row_number() OVER (
         |      ORDER BY cnt_pair DESC, a_part, b_part) AS rn
         |    FROM pairs) WHERE rn <= $TopPairs),
         |ic AS (
         |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt_item
         |  FROM items GROUP BY 1)
         |SELECT a_part, b_part, cnt_pair,
         |  ia.cnt_item AS cnt_a, ib.cnt_item AS cnt_b,
         |  round(CAST(cnt_pair AS DOUBLE) / n_orders, 6) AS support,
         |  round(CAST(cnt_pair AS DOUBLE) / ia.cnt_item, 6) AS confidence,
         |  round(CAST(cnt_pair AS DOUBLE) * n_orders /
         |    (ia.cnt_item * ib.cnt_item), 6) AS lift
         |FROM top
         |JOIN ic ia ON a_part = ia.l_partkey
         |JOIN ic ib ON b_part = ib.l_partkey
         |CROSS JOIN tot
         |ORDER BY cnt_pair DESC, a_part, b_part""".stripMargin,

    "q118_decile_lift" ->
      """WITH labels AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1995),
        |scored AS (
        |  SELECT c_custkey, c_acctbal,
        |    CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END AS label
        |  FROM customer LEFT JOIN labels ON c_custkey = o_custkey),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total_n,
        |    CAST(sum(label) AS BIGINT) AS total_pos
        |  FROM scored),
        |ranked AS (
        |  SELECT label, row_number() OVER (
        |    ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM scored),
        |dec AS (
        |  SELECT ((rn - 1) * 10) // total_n + 1 AS decile, label
        |  FROM ranked CROSS JOIN tot),
        |agg AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(label) AS BIGINT) AS n_pos
        |  FROM dec GROUP BY 1),
        |cum AS (
        |  SELECT *, CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT)
        |    AS cum_pos
        |  FROM agg)
        |SELECT CAST(decile AS BIGINT) AS decile, n_cust, n_pos, cum_pos,
        |  round(CAST(cum_pos AS DOUBLE) / total_pos, 6) AS capture_rate,
        |  round(CAST(n_pos AS DOUBLE) * total_n /
        |    (n_cust * total_pos), 6) AS lift
        |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin,

    "m12_tile_grid" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    octet_length(encode(text)) % 640 + 1 AS width,
         |    octet_length(encode(text)) % 480 + 1 AS height
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT media_id, width, height,
         |    greatest(1, (width - ${Tile - Stride} + ${Stride - 1})
         |      // $Stride) AS n_x,
         |    greatest(1, (height - ${Tile - Stride} + ${Stride - 1})
         |      // $Stride) AS n_y
         |  FROM m),
         |tiles AS (
         |  SELECT media_id, width, height, n_x, n_y,
         |    least((r.i % n_x) * $Stride,
         |      greatest(0, width - $Tile)) AS x0,
         |    least((r.i // n_x) * $Stride,
         |      greatest(0, height - $Tile)) AS y0
         |  FROM g, UNNEST(range(n_x * n_y)) AS r(i)),
         |rects AS (
         |  SELECT *, least(x0 + $Tile, width) AS x1,
         |    least(y0 + $Tile, height) AS y1
         |  FROM tiles)
         |SELECT media_id, CAST(width AS INTEGER) AS width,
         |  CAST(height AS INTEGER) AS height,
         |  CAST(n_x AS BIGINT) AS n_tiles_x, CAST(n_y AS BIGINT) AS n_tiles_y,
         |  CAST(count(*) AS BIGINT) AS n_tiles,
         |  CAST(count(*) FILTER (WHERE x1 - x0 = $Tile AND y1 - y0 = $Tile)
         |    AS BIGINT) AS n_full,
         |  CAST(sum(x0 + 31 * y0 + 997 * x1 + 7919 * y1) AS BIGINT)
         |    AS coords_sum
         |FROM rects GROUP BY 1, 2, 3, 4, 5 ORDER BY media_id""".stripMargin,
  )
}
