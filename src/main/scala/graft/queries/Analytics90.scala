package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 102 (SURVEY.md §2.4):
  *
  *  - q258: isotonic calibration via pool-adjacent-violators — the
  *    monotone-fit step of classifier calibration: per price-bin
  *    'F'-status rates are pooled until non-decreasing. The 10-bin
  *    state lives in ONE bounded array row (the only data-sized work is
  *    the binning aggregation); 9 unrolled PAVA steps each merge the
  *    LEFTMOST adjacent violator — found by exact integer
  *    cross-multiplication y_i·n_{i+1} > y_{i+1}·n_i (never a float
  *    rate compare; the multiply rides DECIMAL/HUGEINT headroom), so
  *    the unique PAVA fixpoint replays bit-for-bit. Blocks carry their
  *    pooled counts and [lo, hi] bin spans; rates go double only in
  *    the final projection.
  *  - q257: HITS hubs & authorities on the directed nation trade graph
  *    (exporter nation → importer nation, weight = trade count) —
  *    [[graft.operators.Hits]] runs 3 unrolled iterations of the
  *    mutually-recursive scores in exact scaled-integer arithmetic
  *    (BIGINT units of 1e-9, products in DECIMAL(38,0), integer L1
  *    normalization), so the oracle's generated HUGEINT replay is
  *    bit-identical. The directionality complement of q64's PageRank:
  *    export-heavy nations surface as hubs, import-heavy as
  *    authorities.
  */
object Analytics90 {
  import Tables.t

  /** PAVA steps to guarantee the fixpoint on `bins` blocks. */
  private val PavaBins = 10

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q258_isotonic" -> ((spark, dir) => {
      val binned = t(spark, dir, "orders")
        .select(expr("least(9, CAST(floor(o_totalprice / 50000) AS INT))")
          .as("bin"),
          (col("o_orderstatus") === "F").as("pos"))
        .groupBy("bin")
        .agg(count_if(col("pos")).as("y"), count(lit(1)).as("n"))
      var fr = binned
        .agg(expr(
          """transform(sort_array(collect_list(
            |    named_struct('bin', bin, 'y', y, 'n', n))),
            |  x -> named_struct('y', x.y, 'n', x.n,
            |                    'lo', x.bin, 'hi', x.bin))""".stripMargin)
          .as("a0"))
      for (r <- 1 to PavaBins - 1) {
        val a = s"a${r - 1}"
        // leftmost adjacent violation, by exact cross-multiplication in
        // DECIMAL(38,0) headroom (BIGINT y·n overflows once bins hold
        // ~3e9 rows each)
        fr = fr.withColumn(s"k$r", expr(
          s"""array_position(transform(sequence(1, size($a) - 1), i ->
             |  IF(element_at($a, i).y
             |       * CAST(element_at($a, i + 1).n AS DECIMAL(38,0)) >
             |     element_at($a, i + 1).y
             |       * CAST(element_at($a, i).n AS DECIMAL(38,0)),
             |     1, 0)), 1)""".stripMargin))
        fr = fr.withColumn(s"a$r", expr(
          s"""IF(k$r = 0, $a, concat(
             |  slice($a, 1, CAST(k$r - 1 AS INT)),
             |  array(named_struct(
             |    'y', element_at($a, CAST(k$r AS INT)).y
             |       + element_at($a, CAST(k$r + 1 AS INT)).y,
             |    'n', element_at($a, CAST(k$r AS INT)).n
             |       + element_at($a, CAST(k$r + 1 AS INT)).n,
             |    'lo', element_at($a, CAST(k$r AS INT)).lo,
             |    'hi', element_at($a, CAST(k$r + 1 AS INT)).hi)),
             |  slice($a, CAST(k$r + 2 AS INT), size($a))))""".stripMargin))
        // One-row frame, but the checkpoint is load-bearing: without it
        // CollapseProject inlines each step's array expression ~8× into
        // the next, and the unrolled chain grows 8^9 before it ever
        // runs (measured: driver OOM at plan time).
        fr = fr.select(col(s"a$r")).localCheckpoint(true)
      }
      fr.select(posexplode(col(s"a${PavaBins - 1}")))
        .select((col("pos") + 1).cast("int").as("block_id"),
          col("col.lo").as("bin_lo"), col("col.hi").as("bin_hi"),
          col("col.n").as("n"), col("col.y").as("y"),
          round(col("col.y").cast("double") / col("col.n").cast("double"),
            6).as("rate"))
        .orderBy("block_id")
    }),

    "q257_hits" -> ((spark, dir) => {
      val edges = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .filter(col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val nation = t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val s = graft.operators.Hits
        .scores(edges, nation.select("n_nationkey"), iters = 3)
      s.join(broadcast(nation), col("node") === col("n_nationkey"))
        .select(col("n_name"), col("hub"), col("authority"))
        .orderBy("n_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q258_isotonic" -> {
      val steps = (1 to PavaBins - 1).map { r =>
        s"""s$r AS (SELECT a, coalesce(list_position(
           |    list_transform(range(len(a) - 1), i ->
           |      CASE WHEN CAST(a[i+1].y AS HUGEINT) * a[i+2].n >
           |                CAST(a[i+2].y AS HUGEINT) * a[i+1].n
           |           THEN 1 ELSE 0 END), 1), 0) AS k
           |  FROM p${r - 1}),
           |p$r AS (SELECT CASE WHEN k = 0 THEN a ELSE list_concat(
           |    list_concat(list_slice(a, 1, k - 1),
           |      [struct_pack(y := a[k].y + a[k+1].y,
           |                   n := a[k].n + a[k+1].n,
           |                   lo := a[k].lo, hi := a[k+1].hi)]),
           |    list_slice(a, k + 2, len(a))) END AS a
           |  FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH bins AS (
         |  SELECT least(9, CAST(floor(o_totalprice / 50000) AS INT)) AS bin,
         |    CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS y,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM orders GROUP BY 1),
         |p0 AS (SELECT list_transform(
         |    list(struct_pack(bin := bin, y := y, n := n) ORDER BY bin),
         |    x -> struct_pack(y := x.y, n := x.n,
         |                     lo := x.bin, hi := x.bin)) AS a
         |  FROM bins),
         |$steps
         |SELECT CAST(i AS INT) AS block_id, a[i].lo AS bin_lo,
         |  a[i].hi AS bin_hi, a[i].n AS n, a[i].y AS y,
         |  round(CAST(a[i].y AS DOUBLE) / CAST(a[i].n AS DOUBLE), 6)
         |    AS rate
         |FROM p${PavaBins - 1}, UNNEST(range(1, len(a) + 1)) AS t(i)
         |ORDER BY block_id""".stripMargin
    },

    "q257_hits" -> {
      val scale = graft.operators.Hits.Scale
      val iters = (1 to 3).map { r =>
        s"""ar$r AS (
           |  SELECT e.dst, sum(CAST(h.h AS HUGEINT) * e.w) AS araw
           |  FROM edges e JOIN h${r - 1} h ON h.node = e.src GROUP BY 1),
           |at$r AS (SELECT sum(araw) AS ta FROM ar$r),
           |a$r AS MATERIALIZED (
           |  SELECT n.node, coalesce(ar.araw, 0) // (t.ta // $scale) AS a
           |  FROM nodes n LEFT JOIN ar$r ar ON n.node = ar.dst
           |  CROSS JOIN at$r t),
           |hr$r AS (
           |  SELECT e.src, sum(CAST(a.a AS HUGEINT) * e.w) AS hraw
           |  FROM edges e JOIN a$r a ON a.node = e.dst GROUP BY 1),
           |ht$r AS (SELECT sum(hraw) AS th FROM hr$r),
           |h$r AS MATERIALIZED (
           |  SELECT n.node, coalesce(hr.hraw, 0) // (t.th // $scale) AS h
           |  FROM nodes n LEFT JOIN hr$r hr ON n.node = hr.src
           |  CROSS JOIN ht$r t)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges AS MATERIALIZED (
         |  SELECT s_nationkey AS src, c_nationkey AS dst,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE s_nationkey <> c_nationkey
         |  GROUP BY 1, 2),
         |nodes AS MATERIALIZED (SELECT n_nationkey AS node FROM nation),
         |h0 AS (SELECT node, CAST($scale AS HUGEINT) AS h FROM nodes),
         |$iters
         |SELECT n_name, CAST(h.h AS BIGINT) AS hub,
         |  CAST(a.a AS BIGINT) AS authority
         |FROM nation
         |JOIN h3 h ON h.node = n_nationkey
         |JOIN a3 a ON a.node = n_nationkey
         |ORDER BY n_name""".stripMargin
    },
  )
}
