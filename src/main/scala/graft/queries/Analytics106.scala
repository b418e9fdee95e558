package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 123 (SURVEY.md §2.4):
  *
  *  - q287: join-key skew report — the diagnosis a planner (or an
  *    engineer sizing a salted join) reads before shuffling on a key:
  *    simulated hash-partition loads for l_suppkey under 32 partitions
  *    (the portable md5-pack hash, so the oracle replays the exact
  *    assignment), the skew factor max/mean, and the top-5 heaviest
  *    keys via the bounded min-k aggregate. One pass, two bounded
  *    aggregations — the report frame is partition-count-sized.
  *  - q288: distributed-aggregation mergeability proof — variance via
  *    the moment algebra (n, Σx, Σx²): computed independently on the
  *    even- and odd-half corpora, merged by plain addition, and pinned
  *    equal to the whole-corpus computation IN THE ORACLE — the
  *    hash-match is the algebraic identity a 1000-executor partial
  *    aggregation relies on. Moments stay exact DECIMAL (quantized
  *    cents); only the final variance is a rounded double.
  */
object Analytics106 {
  import Tables.t

  private val NPart = 32

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q287_skew_report" -> ((spark, dir) => {
      val keyed = t(spark, dir, "lineitem")
        .select(col("l_suppkey").as("k"))
        .withColumn("p",
          graft.functions.Md5Pack(concat(lit("skew_"),
            col("k").cast("string"))) % NPart)
      val loads = keyed.groupBy("p").agg(count(lit(1)).as("rows"))
      val heavy = keyed.groupBy("k").agg(count(lit(1)).as("c"))
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("c")).as("nc"), col("k")), 5).as("w"))
        .select(posexplode(col("w")).as(Seq("r", "t")))
        .select((col("r") + 1).as("rank"), col("t")("k").as("key"),
          (-col("t")("nc")).as("key_rows"))
      val stats = loads.agg(
          sum(col("rows")).as("n_rows"),
          max(col("rows")).as("max_load"),
          count(lit(1)).as("n_parts"))
        .select(col("n_rows"), col("n_parts"), col("max_load"),
          round(col("max_load").cast("double")
            * col("n_parts") / col("n_rows"), 6).as("skew_factor"))
      heavy.crossJoin(broadcast(stats))
        .select(col("rank"), col("key"), col("key_rows"), col("n_rows"),
          col("n_parts"), col("max_load"), col("skew_factor"))
        .orderBy("rank")
    }),

    "q288_moment_merge" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      def moments(df: DataFrame): DataFrame = df.agg(
        count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("s1"),
        sum(expr("cast(cents as decimal(38,0)) * cents")).as("s2"))
      val even = moments(o.filter(col("k") % 2 === 0))
        .select(col("n").as("n_a"), col("s1").as("s1_a"),
          col("s2").as("s2_a"))
      val odd = moments(o.filter(col("k") % 2 === 1))
        .select(col("n").as("n_b"), col("s1").as("s1_b"),
          col("s2").as("s2_b"))
      even.crossJoin(broadcast(odd))
        .select(
          (col("n_a") + col("n_b")).as("n"),
          (col("s1_a") + col("s1_b")).as("s1"),
          (col("s2_a") + col("s2_b")).as("s2"))
        .select(col("n"), col("s1").cast("long").as("s1"),
          // s2 exceeds int64 range: present the exact decimal through a
          // correctly-rounded DOUBLE (identical bits in both engines)
          col("s2").cast("decimal(38,0)").cast("double").as("s2"),
          // population variance in dollars² from the merged moments
          round(
            (col("s2").cast("double")
              - col("s1").cast("double") * col("s1") / col("n"))
              / col("n") / 10000, 6).as("variance"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q287_skew_report" -> {
      val hash = Tables.duckMd5Pack("'skew_' || CAST(l_suppkey AS VARCHAR)")
      s"""
      WITH keyed AS (
        SELECT l_suppkey AS k, ($hash) % $NPart AS p FROM lineitem),
      loads AS (
        SELECT p, CAST(count(*) AS BIGINT) AS rows_ FROM keyed GROUP BY p),
      stats AS (
        SELECT CAST(sum(rows_) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_parts,
          CAST(max(rows_) AS BIGINT) AS max_load,
          round(CAST(max(rows_) AS DOUBLE) * count(*) / sum(rows_), 6)
            AS skew_factor
        FROM loads),
      heavy AS (
        SELECT k, CAST(count(*) AS BIGINT) AS c,
          row_number() OVER (ORDER BY count(*) DESC, k) AS rank
        FROM keyed GROUP BY k)
      SELECT CAST(rank AS INTEGER) AS rank, k AS key, c AS key_rows,
        n_rows, n_parts, max_load, skew_factor
      FROM heavy, stats
      WHERE rank <= 5
      ORDER BY rank"""
    },

    "q288_moment_merge" -> """
      WITH o AS (
        SELECT o_orderkey AS k,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      full_m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(cents AS HUGEINT)) AS DECIMAL(38,0)) AS s1,
          CAST(sum(CAST(cents AS HUGEINT) * cents) AS DECIMAL(38,0)) AS s2
        FROM o)
      SELECT n, CAST(s1 AS BIGINT) AS s1, CAST(s2 AS DOUBLE) AS s2,
        round((CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
          / n / 10000, 6) AS variance
      FROM full_m""",
  )
}
