package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 analytics additions (SURVEY.md §2.2 engine stance):
  *
  *  - q82: Markov transition matrix over per-user event sequences — the
  *    behavioral-model census (what follows what, with probabilities).
  *    One user-keyed window for sequence adjacency, one event-type²-
  *    bounded aggregation; probabilities normalize on the bounded pair
  *    frame.
  *  - q83: correlation matrix — all pairwise Pearson correlations in
  *    ONE aggregation pass (shared scan, every co-moment map-side
  *    combinable), melted to tidy rows through the q52 stack device.
  *  - q84: winsorized robust statistics — clip at exact p01/p99 (the
  *    q63 percentile machinery), then per-group raw-vs-clipped means
  *    with clip-count attribution; the outlier-handling step ahead of
  *    any numeric feature pipeline.
  *  - q85: deterministic per-group reservoir — fixed k samples per
  *    group by md5 priority through the bounded min-k aggregate (at
  *    most k rows per group per map partition cross the shuffle; a
  *    row_number window would sort entire groups in single tasks).
  *    Complements q39 (rate sample) and q62 (stratified rates) with a
  *    fixed-SIZE per-group contract.
  */
object Analytics6 {

  /** SCD2 version frame shared by q87 (history build) and q108
    * (point-in-time lookup): the q73 changelog rules rendered as
    * `(k, valid_from, valid_to, status, price)` validity intervals,
    * delete-closed, unordered. [[Scd2VersionsSql]] is its DuckDB replica.
    */
  private[queries] def scd2Versions(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(spark, dir, "orders")
    val key = col("o_orderkey")
    val price = col("o_totalprice").cast("decimal(18,2)")
    val ins = o.filter(key % 3 === 0 && key % 2 === 1)
      .select(key.as("k"), lit("I").as("op"), lit(0L).as("seq"),
        col("o_orderstatus").as("status"), price.as("price"))
    val upd1 = o.filter(key % 5 === 0)
      .select(key.as("k"), lit("U").as("op"), lit(1L).as("seq"),
        col("o_orderstatus").as("status"),
        (price + 100).cast("decimal(18,2)").as("price"))
    val del = o.filter(key % 7 === 0 && key % 5 =!= 0)
      .select(key.as("k"), lit("D").as("op"), lit(1L).as("seq"),
        lit("X").as("status"), lit(0).cast("decimal(18,2)").as("price"))
    val upd2 = o.filter(key % 10 === 0)
      .select(key.as("k"), lit("U").as("op"), lit(2L).as("seq"),
        col("o_orderstatus").as("status"),
        (price + 200).cast("decimal(18,2)").as("price"))
    val w = Window.partitionBy("k").orderBy("seq")
    ins.unionByName(upd1).unionByName(del).unionByName(upd2)
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") =!= "D")
      .select(col("k"), col("seq").as("valid_from"), col("valid_to"),
        col("status"), col("price").cast("double").as("price"))
  }

  /** DuckDB CTE chain ending in `versions` — the oracle replica of
    * [[scd2Versions]]; splice after WITH.
    */
  private[queries] val Scd2VersionsSql: String =
    """cl AS (
      |  SELECT o_orderkey AS k, 'I' AS op, 0 AS seq,
      |    o_orderstatus AS status,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 = 1
      |  UNION ALL
      |  SELECT o_orderkey, 'U', 1, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2))
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', 1, 'X', CAST(0 AS DECIMAL(18,2))
      |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 5 <> 0
      |  UNION ALL
      |  SELECT o_orderkey, 'U', 2, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 200 AS DECIMAL(18,2))
      |  FROM orders WHERE o_orderkey % 10 = 0),
      |v AS (
      |  SELECT k, op, seq, status, price,
      |    lead(seq, 1) OVER (PARTITION BY k ORDER BY seq) AS valid_to
      |  FROM cl),
      |versions AS (
      |  SELECT k, CAST(seq AS BIGINT) AS valid_from,
      |    CAST(valid_to AS BIGINT) AS valid_to, status,
      |    CAST(price AS DOUBLE) AS price
      |  FROM v WHERE op <> 'D')""".stripMargin
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Adjacent-event transitions: lead() inside the user partition
    // (event_id breaks timestamp ties deterministically), counts on the
    // (from, to) key — a frame bounded by event-type², so the
    // row-probability window runs on a broadcast-scale frame.
    "q82_markov_transitions" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wFrom = Window.partitionBy("from_type")
      t(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p",
          round(col("n").cast("double") / sum(col("n")).over(wFrom), 6))
        .orderBy("from_type", "to_type")
    }),

    // All 6 pairwise correlations of the lineitem quantity/price/
    // discount/tax columns in one agg; corr merges co-moments across
    // partitions, so the cross-engine boundary is rounded (q43 recipe).
    "q83_correlation_matrix" -> ((spark, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield (cols(i), cols(j))
      val aggs = pairs.map { case (a, b) =>
        round(corr(col(a), col(b)), 6).as(s"${a}__$b")
      }
      val wide = t(spark, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
      val stackArgs = pairs
        .map { case (a, b) => s"'$a', '$b', `${a}__$b`" }
        .mkString(", ")
      wide.select(expr(
          s"stack(${pairs.length}, $stackArgs) AS (col_a, col_b, corr)"))
        .orderBy("col_a", "col_b")
    }),

    // Winsorization: exact p01/p99 bounds broadcast to the clipping
    // scan; clipped values re-enter DECIMAL after a 2-decimal round so
    // the per-group means stay order-independent. Two passes over the
    // input (bounds, then clip+aggregate), no sort anywhere.
    "q84_winsorize" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val bounds = li.agg(
        expr("percentile(l_extendedprice, 0.01)").as("lo"),
        expr("percentile(l_extendedprice, 0.99)").as("hi"))
      val clipped = least(greatest(col("l_extendedprice"), col("lo")),
        col("hi"))
      li.crossJoin(broadcast(bounds))
        .withColumn("cl",
          round(clipped, 2).cast("decimal(18,2)"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          count_if(col("l_extendedprice") < col("lo")).as("n_clip_low"),
          count_if(col("l_extendedprice") > col("hi")).as("n_clip_high"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double") / count(lit(1)), 4).as("mean_raw"),
          round(sum(col("cl")).cast("double") / count(lit(1)), 4)
            .as("mean_winsor"))
        .orderBy("l_returnflag")
    }),

    // Ordered string aggregation (LISTAGG): per nation, the 5
    // alphabetically-first customer names as one csv — the membership
    // comes from the bounded min-k aggregate (at most 5 names per
    // nation per map partition cross the shuffle), the concatenation
    // from an in-row transform+join, so no collect_list of unbounded
    // groups anywhere.
    "q91_listagg" -> ((spark, dir) => {
      t(spark, dir, "customer")
        .groupBy("c_nationkey")
        .agg(graft.functions.TopKAgg
          .minK(struct(col("c_name")), 5).as("arr"),
          count(lit(1)).as("n_customers"))
        .select(col("c_nationkey"),
          array_join(transform(col("arr"), x => x.getField("c_name")), ",")
            .as("first_names"),
          col("n_customers"))
        .orderBy("c_nationkey")
    }),

    // Nested result types: per returnflag, the per-status counts as a
    // SORTED array of structs plus the total — the shape a catalog/API
    // layer returns for drill-down without a second query. The inner
    // rollup aggregates first (map-side combinable), so collect_list
    // only ever sees the status-bounded frame; array_sort makes the
    // nested ordering deterministic across partitioning.
    "q92_nested_rollup" -> ((spark, dir) => {
      t(spark, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .groupBy("l_returnflag")
        .agg(array_sort(collect_list(
            struct(col("l_linestatus").as("status"), col("n"))))
            .as("nested"),
          sum(col("n")).cast("long").as("total"))
        // the driver's comparator handles scalars only — the nested
        // array serializes to canonical JSON at the output edge (both
        // engines emit compact {"status":...,"n":...} in array order)
        .select(col("l_returnflag"), to_json(col("nested")).as("by_status"),
          col("total"))
        .orderBy("l_returnflag")
    }),

    // Rank-distribution windows — percent_rank / cume_dist / ntile, the
    // three ranking functions the rest of the window surface doesn't
    // exercise — as a per-nation balance-quartile profile. These
    // functions intrinsically sort their partition (unlike min-k there
    // is no bounded-aggregate shortcut), so the partition key is the
    // nation (customer-count/25 per partition); a corpus-scale
    // distribution would bin through q63's broadcast equi-depth
    // boundaries instead. Output rolls up to nation×quartile.
    "q90_rank_distributions" -> ((spark, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("c_nationkey", "quartile")
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("bal_min"),
          max(col("c_acctbal")).as("bal_max"),
          round(max(col("pr")), 6).as("pr_max"),
          round(max(col("cd")), 6).as("cd_max"))
        .orderBy("c_nationkey", "quartile")
    }),

    // Top 3-step user journeys: the q82 adjacency extended to length-3
    // paths (two leads in ONE window pass — same partition, same sort),
    // counts on the path key (event-type³-bounded), deterministic
    // top-10 via TakeOrderedAndProject.
    "q89_event_paths" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // SCD2 version history from the q73 changelog rules: each non-delete
    // change opens a version valid [seq, next-change-seq); the latest
    // open version is current; a delete closes history without opening.
    // One key-partitioned window over ≤3-row groups — the warehouse
    // dimension-history builder next to q73's latest-image MERGE.
    "q87_scd2_intervals" -> ((spark, dir) => {
      scd2Versions(spark, dir)
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("k", "valid_from")
    }),

    // Two-proportion A/B analysis: md5-deterministic user-level variant
    // assignment (the q39/q79 machinery at the experiment layer).
    // "Converted" = the user's purchase SHARE exceeds 20% (an integer
    // compare, n_purch·5 > n_events, so the split point is exact in
    // both engines and lands near the corpus median at any SF — every
    // user purchases at least once, so any-purchase would saturate).
    // The pooled two-proportion z-statistic computes from one
    // conditional aggregation — integer counts cross engines, doubles
    // only in the final closed-form expression, NULL when the pooled
    // variance degenerates (all or no users converted).
    "q88_ab_test" -> ((spark, dir) => {
      val conv = t(spark, dir, "events")
        .groupBy("user_id")
        .agg(count_if(col("event_type") === "purchase").as("n_purch"),
          count(lit(1)).as("n_ev"))
        .withColumn("variant",
          when(pmod(graft.functions.Md5Pack(col("user_id").cast("string")),
            lit(2)) === 0, "A").otherwise("B"))
        .withColumn("converted", col("n_purch") * 5 > col("n_ev"))
      val agged = conv.agg(
        count_if(col("variant") === "A").as("n_a"),
        count_if(col("variant") === "A" && col("converted")).as("conv_a"),
        count_if(col("variant") === "B").as("n_b"),
        count_if(col("variant") === "B" && col("converted")).as("conv_b"))
      val crA = col("conv_a").cast("double") / col("n_a")
      val crB = col("conv_b").cast("double") / col("n_b")
      val pPool = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b"))
      val denom = sqrt(pPool * (lit(1.0) - pPool) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      agged.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(crA, 6).as("cr_a"), round(crB, 6).as("cr_b"),
        when(col("n_a") > 0 && col("n_b") > 0 && denom > 0,
          round((crA - crB) / denom, 4)).as("z_score"))
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent click/view within the 3-day lookback (else 'direct') — the
    // marketing-attribution join expressed as ONE user-keyed window
    // (last touch rides an ignoreNulls last() over the preceding-rows
    // frame), never an event×event self-join. Value sums re-enter
    // DECIMAL after a 6-decimal round (the q1 events recipe) so the
    // per-channel totals are order-independent.
    "q86_attribution" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type").isin("click", "view")
      val touched = t(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("touch",
          last(when(isTouch,
            struct(col("ts").as("t_ts"), col("event_type").as("t_type"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          // interval comparison on raw timestamps — epoch-seconds
          // truncation would disagree between engines at sub-second
          // boundaries
          when(col("touch").isNotNull &&
            col("ts") <= col("touch.t_ts") + expr("INTERVAL 3 DAYS"),
            col("touch.t_type")).otherwise(lit("direct")))
      touched.groupBy("channel")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double"), 4).as("attributed_value"))
        .orderBy("channel")
    }),

    // Per-group reservoir: md5 priority + the bounded min-k aggregate;
    // posexplode recovers the within-group rank. The sampled frame is
    // k × |groups| — broadcast-scale regardless of corpus size.
    "q85_group_reservoir" -> ((spark, dir) => {
      val pri = graft.functions.Md5Pack(col("event_id").cast("string"))
      t(spark, dir, "events")
        .select(col("event_type"), pri.as("pri"), col("event_id"))
        .groupBy("event_type")
        .agg(graft.functions.TopKAgg
          .minK(struct(col("pri"), col("event_id")), 5).as("sample"))
        .select(col("event_type"), posexplode(col("sample")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rk"),
          col("col.event_id").as("event_id"), col("col.pri").as("pri"))
        .orderBy("event_type", "rk")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q82_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    sum(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM pairs ORDER BY from_type, to_type""".stripMargin,

    "q83_correlation_matrix" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val rows = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
                 |  round(corr(${cols(i)}, ${cols(j)}), 6) AS corr
                 |FROM lineitem""".stripMargin
      rows.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    "q84_winsorize" ->
      """WITH b AS (
        |  SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
        |    quantile_cont(l_extendedprice, 0.99) AS hi
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE l_extendedprice < lo) AS BIGINT)
        |    AS n_clip_low,
        |  CAST(count(*) FILTER (WHERE l_extendedprice > hi) AS BIGINT)
        |    AS n_clip_high,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 4) AS mean_raw,
        |  round(CAST(sum(CAST(round(least(greatest(l_extendedprice, lo), hi),
        |    2) AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS mean_winsor
        |FROM lineitem CROSS JOIN b
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q91_listagg" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_name,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_name)
        |      AS rn
        |  FROM customer),
        |agg AS (
        |  SELECT c_nationkey,
        |    string_agg(c_name, ',' ORDER BY c_name) AS first_names
        |  FROM r WHERE rn <= 5 GROUP BY c_nationkey),
        |n AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM customer GROUP BY c_nationkey)
        |SELECT agg.c_nationkey, first_names, n_customers
        |FROM agg JOIN n ON agg.c_nationkey = n.c_nationkey
        |ORDER BY agg.c_nationkey""".stripMargin,

    "q92_nested_rollup" ->
      """WITH cnt AS (
        |  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  CAST(to_json(list(struct_pack(status := l_linestatus, n := n)
        |    ORDER BY l_linestatus, n)) AS VARCHAR) AS by_status,
        |  CAST(sum(n) AS BIGINT) AS total
        |FROM cnt GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q90_rank_distributions" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_acctbal,
        |    percent_rank() OVER w AS pr,
        |    cume_dist() OVER w AS cd,
        |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal, c_custkey))
        |SELECT c_nationkey, quartile, CAST(count(*) AS BIGINT) AS n,
        |  min(c_acctbal) AS bal_min, max(c_acctbal) AS bal_max,
        |  round(max(pr), 6) AS pr_max, round(max(cd), 6) AS cd_max
        |FROM r GROUP BY c_nationkey, quartile
        |ORDER BY c_nationkey, quartile""".stripMargin,

    "q89_event_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events)
        |SELECT e1 || '>' || e2 || '>' || e3 AS path,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "q87_scd2_intervals" ->
      s"""WITH $Scd2VersionsSql
         |SELECT k, valid_from, valid_to, status, price,
         |  valid_to IS NULL AS is_current
         |FROM versions ORDER BY k, valid_from""".stripMargin,

    "q88_ab_test" -> {
      val pri = Tables.duckMd5Pack("CAST(user_id AS VARCHAR)")
      s"""WITH conv AS (
         |  SELECT user_id,
         |    CASE WHEN ($pri) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         |    count(*) FILTER (WHERE event_type = 'purchase') * 5 > count(*)
         |      AS converted
         |  FROM events GROUP BY user_id),
         |agged AS (
         |  SELECT
         |    CAST(count(*) FILTER (WHERE variant = 'A') AS BIGINT) AS n_a,
         |    CAST(count(*) FILTER (WHERE variant = 'A' AND converted)
         |      AS BIGINT) AS conv_a,
         |    CAST(count(*) FILTER (WHERE variant = 'B') AS BIGINT) AS n_b,
         |    CAST(count(*) FILTER (WHERE variant = 'B' AND converted)
         |      AS BIGINT) AS conv_b
         |  FROM conv),
         |z AS (
         |  SELECT n_a, conv_a, n_b, conv_b,
         |    CAST(conv_a AS DOUBLE) / n_a AS cr_a,
         |    CAST(conv_b AS DOUBLE) / n_b AS cr_b,
         |    sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |      * (1.0 / n_a + 1.0 / n_b)) AS denom
         |  FROM agged)
         |SELECT n_a, conv_a, n_b, conv_b,
         |  round(cr_a, 6) AS cr_a, round(cr_b, 6) AS cr_b,
         |  CASE WHEN n_a > 0 AND n_b > 0 AND denom > 0
         |    THEN round((cr_a - cr_b) / denom, 4) END AS z_score
         |FROM z""".stripMargin
    },

    "q86_attribution" ->
      """WITH seq AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |      THEN struct_pack(t_ts := ts, t_type := event_type) END
        |      IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events),
        |p AS (
        |  SELECT CASE WHEN touch IS NOT NULL
        |      AND ts <= touch.t_ts + INTERVAL 3 DAY
        |    THEN touch.t_type ELSE 'direct' END AS channel, value
        |  FROM seq WHERE event_type = 'purchase')
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
        |  round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE),
        |    4) AS attributed_value
        |FROM p GROUP BY channel ORDER BY channel""".stripMargin,

    "q85_group_reservoir" ->
      s"""SELECT event_type, CAST(rn AS INTEGER) AS rk, event_id, pri
         |FROM (
         |  SELECT event_type, event_id, pri,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY pri, event_id) AS rn
         |  FROM (
         |    SELECT event_type, event_id,
         |      ${Tables.duckMd5Pack("CAST(event_id AS VARCHAR)")} AS pri
         |    FROM events))
         |WHERE rn <= 5 ORDER BY event_type, rk""".stripMargin,
  )
}
