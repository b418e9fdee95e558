package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 relational additions, batch 4 (SURVEY.md §2.4):
  *
  *  - q103: Merkle-style replica reconciliation — the anti-entropy
  *    primitive behind cross-region table sync at 100 TB. Each replica is
  *    folded to (bucket → row-count, XOR of row fingerprints); only
  *    buckets whose digests disagree surface, so the network cost of a
  *    full-table diff collapses from O(rows) to O(buckets + skew). Both
  *    digests are map-side-combinable aggregates over one scan each; XOR
  *    is order-free, so no sort anywhere.
  *  - q104: half-life decay aggregation — time-decayed customer value,
  *    the standard recency feature for training pipelines. The decay
  *    weight is 0.5^(age div 90): an EXACT power of two, so the
  *    double multiply never rounds and both engines agree bit-for-bit
  *    before the per-row round→DECIMAL makes the sum order-free.
  *  - q105: k-anonymity / l-diversity audit — the pre-release privacy
  *    gate over a table's quasi-identifiers: every equivalence class
  *    (nation × segment) reports its size k and the diversity l of the
  *    sensitive attribute (acctbal binned window-free via floor/1000);
  *    classes failing k≥10 or l≥3 are the rows a release would have to
  *    suppress. One map-side-combinable aggregation over one scan.
  *  - q106: incremental aggregate maintenance (IVM) — the base partition
  *    of a summary and the delta partition are aggregated SEPARATELY and
  *    merged by combining partial states (count/sum add, avg re-derived
  *    from the merged sums — never averaged averages). At 100 TB this is
  *    the difference between re-scanning the world and scanning today's
  *    delta; the oracle computes the full aggregate directly, proving
  *    merge-equals-recompute.
  */
object Analytics8 {
  import Tables.t

  /** Deterministic "replica drift" for q103, derived purely from the key
    * hash so both engines reproduce it: ~1% of rows deleted (kh%97==0),
    * ~1% price-corrupted (kh%89==1).
    */
  private val DropMod = 97
  private val CorruptMod = 89
  private val Buckets = 512

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Replica reconciliation: fingerprint each row canonically
    // (key|custkey|status|price as DECIMAL(18,2) text — a rendering both
    // engines share), bucket rows by key-hash, and compare per-bucket
    // (count, XOR-digest) across the two replicas. Only differing
    // buckets are emitted, classified count_skew vs content_skew. At
    // scale each side is one scan + one bounded-width aggregation; the
    // join is on the bucket id (Buckets rows per side).
    "q103_bucket_reconcile" -> ((spark, dir) => {
      val base = t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          graft.functions.Md5Pack(col("o_orderkey").cast("string")).as("kh"))
      def digest(df: DataFrame): DataFrame = graft.operators.Reconcile
        .digest(df,
          fingerprint = graft.functions.Md5Pack(concat_ws("|",
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            round(col("price"), 2).cast("decimal(18,2)").cast("string"))),
          bucketKey = col("kh") % Buckets)
      val a = digest(base.withColumn("price", col("o_totalprice")))
      val b = digest(base
        .filter(col("kh") % DropMod =!= 0)
        .withColumn("price",
          when(col("kh") % CorruptMod === 1, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice"))))
      graft.operators.Reconcile.diff(a, b).orderBy("bucket")
    }),

    // Half-life decayed customer value: weight = 0.5^(age_days div 90)
    // relative to the corpus anchor date. The per-row term rounded to
    // 6 dp is computed ENTIRELY in Long arithmetic — price·0.5^k in
    // micro-units is cents·10^4/2^k, and half-up rounding of n/2^k is
    // (n + 2^(k-1)) div 2^k — because round(double, 6) of cents/2^k
    // hits exact-half decimals where Spark (HALF_UP on shortest repr)
    // and DuckDB (scale-and-rint) disagree by 1 ulp. Integer terms make
    // the sum order-free. One map-side-combinable aggregation over one
    // scan — the shape survives any scale factor.
    "q104_decay_halflife" -> ((spark, dir) =>
      t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " * 10000").as("c4"),
          expr("least(datediff(DATE'2001-08-01', CAST(o_orderdate AS DATE))" +
            " div 90, 62L)").cast("int").as("k"))
        .select(col("o_custkey"), col("o_orderdate"),
          expr("""CASE WHEN k = 0 THEN c4
                 |     ELSE (c4 + shiftleft(1L, k - 1)) div shiftleft(1L, k)
                 |END""".stripMargin).as("micro"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          (sum("micro").cast("double") * lit(1e-6)).as("decayed_value"),
          max(col("o_orderdate").cast("date")).as("last_order"))
        .orderBy("o_custkey")),

    // Privacy audit: per quasi-identifier class, size k and sensitive-
    // attribute diversity l, with the suppression verdicts a release
    // pipeline would enforce. The sensitive bin is a row-local floor —
    // no window, no second shuffle beyond the distinct-aggregate's
    // standard two-level expansion.
    "q105_k_anonymity" -> ((spark, dir) =>
      t(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).as("sens_bin"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("k_size"),
          countDistinct(col("sens_bin")).as("l_div"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("k_size"),
          col("l_div"),
          (col("k_size") >= 10).as("k_anon"),
          (col("l_div") >= 3).as("l_diverse"))
        .orderBy("c_nationkey", "c_mktsegment")),

    // IVM merge: base summary (orders < 2000-01-01) + delta summary
    // (orders ≥ cutoff) combined by partial-state addition. DECIMAL sums
    // are order-free, so base+delta lands on exactly the oracle's
    // full-recompute bits; avg is re-derived from merged sums.
    "q106_incremental_agg" -> ((spark, dir) => {
      val orders = t(spark, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderstatus"),
          col("o_orderdate"),
          round(col("o_totalprice"), 2).cast("decimal(18,2)").as("p"))
      def summarize(df: DataFrame): DataFrame = df
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("p").as("s"))
      val cutoff = lit("2000-01-01").cast("date")
      val base = summarize(orders.filter(col("o_orderdate") < cutoff))
      val delta = summarize(orders.filter(col("o_orderdate") >= cutoff))
      base.select(col("o_orderpriority"), col("o_orderstatus"),
          col("n").as("n_b"), col("s").as("s_b"))
        .join(delta.select(col("o_orderpriority"), col("o_orderstatus"),
          col("n").as("n_d"), col("s").as("s_d")),
          Seq("o_orderpriority", "o_orderstatus"), "full_outer")
        .select(col("o_orderpriority"), col("o_orderstatus"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_orders"),
          // the merge itself is exact DECIMAL; the dumped column is
          // DOUBLE because the driver's comparator renders decimals
          // through float64 on one side only (parity note: no DECIMAL
          // may reach a final select)
          (coalesce(col("s_b"), lit(BigDecimal(0)).cast("decimal(28,2)")) +
            coalesce(col("s_d"), lit(BigDecimal(0)).cast("decimal(28,2)")))
            .cast("double").as("total"))
        .withColumn("avg_price",
          round(col("total").cast("double") / col("n_orders"), 6))
        .orderBy("o_orderpriority", "o_orderstatus")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q103_bucket_reconcile" -> {
      def digest(pricePred: String, filter: String) =
        s"""SELECT kh % $Buckets AS bucket,
           |    CAST(count(*) AS BIGINT) AS n,
           |    bit_xor(${Tables.duckMd5Pack(
               s"concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
                 s"CAST(CAST(round($pricePred, 2) AS DECIMAL(18,2)) AS VARCHAR))")}) AS x
           |  FROM base $filter GROUP BY 1""".stripMargin
      s"""WITH base AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |    ${Tables.duckMd5Pack("CAST(o_orderkey AS VARCHAR)")} AS kh
         |  FROM orders),
         |a AS (
         |  ${digest("o_totalprice", "")}),
         |b AS (
         |  ${digest(
             s"o_totalprice + CASE WHEN kh % $CorruptMod = 1 THEN 1.0 ELSE 0.0 END",
             s"WHERE kh % $DropMod <> 0")})
         |SELECT coalesce(a.bucket, b.bucket) AS bucket,
         |  coalesce(a.n, 0) AS n_a, coalesce(b.n, 0) AS n_b,
         |  CASE WHEN coalesce(a.n, 0) <> coalesce(b.n, 0) THEN 'count_skew'
         |       ELSE 'content_skew' END AS status
         |FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
         |WHERE coalesce(a.n, 0) <> coalesce(b.n, 0)
         |   OR a.x IS DISTINCT FROM b.x
         |ORDER BY bucket""".stripMargin
    },

    // Same Long-only half-up device as the Spark side: micro-units of
    // price·0.5^k are cents·10^4/2^k, rounded as (n + 2^(k-1)) // 2^k.
    "q104_decay_halflife" ->
      """WITH rows_k AS (
        |  SELECT o_custkey, o_orderdate,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 10000 AS c4,
        |    least(date_diff('day', CAST(o_orderdate AS DATE),
        |      DATE '2001-08-01') // 90, 62) AS k
        |  FROM orders)
        |SELECT o_custkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN k = 0 THEN c4
        |           ELSE (c4 + (1::BIGINT << (k - 1))) // (1::BIGINT << k)
        |           END) AS DOUBLE) * 1e-6 AS decayed_value,
        |  max(CAST(o_orderdate AS DATE)) AS last_order
        |FROM rows_k GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "q105_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS k_size,
        |  CAST(count(DISTINCT floor(c_acctbal / 1000.0)) AS BIGINT)
        |    AS l_div,
        |  count(*) >= 10 AS k_anon,
        |  count(DISTINCT floor(c_acctbal / 1000.0)) >= 3 AS l_diverse
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // Full recompute — the merged incremental result must land on
    // exactly these bits.
    "q106_incremental_agg" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS total,
        |  round(CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
        |      AS DOUBLE) / count(*), 6) AS avg_price
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
  )
}
