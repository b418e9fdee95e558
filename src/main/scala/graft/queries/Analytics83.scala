package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 92 (SURVEY.md §2.4):
  *
  *  - q246: encoding advisor — the storage-layout heuristic a
  *    columnar writer applies: exact distinct counts per column (the
  *    q65 Expand machinery, one shared scan) turn into
  *    dictionary/RLE/plain advice by distinct-ratio thresholds. The
  *    advice rules are data-derived and pinned cross-engine, so a
  *    testdata regeneration that changes a column's cardinality class
  *    shows up as a flipped row.
  *  - q247: pagination-equivalence pin — OFFSET/LIMIT page 3 must
  *    equal the keyset page (WHERE key > last-of-page-2 LIMIT 100)
  *    under a total order: same row count, same first/last keys, and
  *    identical page fingerprints. The contract that lets an API
  *    migrate from offset pagination (O(offset) skip cost) to keyset
  *    (O(1)) without changing results.
  */
object Analytics83 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q246_encoding_advisor" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_shipdate", "l_partkey", "l_extendedprice")
      val aggs = Seq(count(lit(1)).as("n")) ++
        cols.map(c => countDistinct(col(c)).as(s"d_$c"))
      val wide = li.agg(aggs.head, aggs.tail: _*)
      val stacks = cols.map(c => s"'$c', d_$c").mkString(", ")
      wide.select(col("n"),
          expr(s"stack(${cols.length}, $stacks) AS (col_name, n_distinct)"))
        .withColumn("distinct_ratio",
          round(col("n_distinct").cast("double") / col("n").cast("double"),
            8))
        .withColumn("advice",
          when(col("n_distinct") <= 100, "RLE_DICT")
            .when(col("distinct_ratio") <= 0.1, "DICT")
            .otherwise("PLAIN"))
        .select("col_name", "n", "n_distinct", "distinct_ratio", "advice")
        .orderBy("col_name")
    }),

    "q247_keyset_pagination" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderkey")).orderBy("o_orderkey")
      val offsetPage = o.limit(300).orderBy(col("o_orderkey").desc)
        .limit(100).orderBy("o_orderkey") // rows 201..300 via limits
      val lastOfPage2 = o.limit(200)
        .agg(max(col("o_orderkey")).as("last_key"))
      val keysetPage = t(spark, dir, "orders")
        .crossJoin(broadcast(lastOfPage2))
        .filter(col("o_orderkey") > col("last_key"))
        .orderBy("o_orderkey").limit(100)
        .select("o_orderkey")
      val a = offsetPage.agg(count(lit(1)).as("n_offset"),
        min(col("o_orderkey")).as("first_offset"),
        max(col("o_orderkey")).as("last_offset"),
        sum(col("o_orderkey")).as("sum_offset"))
      val b = keysetPage.agg(count(lit(1)).as("n_keyset"),
        min(col("o_orderkey")).as("first_keyset"),
        max(col("o_orderkey")).as("last_keyset"),
        sum(col("o_orderkey")).as("sum_keyset"))
      a.crossJoin(b)
        .withColumn("equivalent",
          col("n_offset") === col("n_keyset")
            && col("first_offset") === col("first_keyset")
            && col("last_offset") === col("last_keyset")
            && col("sum_offset") === col("sum_keyset"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q246_encoding_advisor" -> {
      val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_shipdate", "l_partkey", "l_extendedprice")
      val ds = cols.map(c =>
        s"CAST(count(DISTINCT $c) AS BIGINT) AS d_$c").mkString(",\n    ")
      val rows = cols.map(c =>
        s"""SELECT '$c' AS col_name, n, d_$c AS n_distinct,
           |  round(CAST(d_$c AS DOUBLE) / n, 8) AS distinct_ratio,
           |  CASE WHEN d_$c <= 100 THEN 'RLE_DICT'
           |    WHEN CAST(d_$c AS DOUBLE) / n <= 0.1 THEN 'DICT'
           |    ELSE 'PLAIN' END AS advice FROM w""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH w AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    $ds
         |  FROM lineitem)
         |$rows
         |ORDER BY col_name""".stripMargin
    },

    "q247_keyset_pagination" ->
      """WITH ordered AS (
        |  SELECT o_orderkey FROM orders ORDER BY o_orderkey),
        |offset_page AS (
        |  SELECT o_orderkey FROM ordered LIMIT 100 OFFSET 200),
        |last2 AS (
        |  SELECT max(o_orderkey) AS last_key FROM (
        |    SELECT o_orderkey FROM ordered LIMIT 200)),
        |keyset_page AS (
        |  SELECT o_orderkey FROM orders CROSS JOIN last2
        |  WHERE o_orderkey > last_key
        |  ORDER BY o_orderkey LIMIT 100),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_offset,
        |    min(o_orderkey) AS first_offset,
        |    max(o_orderkey) AS last_offset,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_offset
        |  FROM offset_page),
        |b AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keyset,
        |    min(o_orderkey) AS first_keyset,
        |    max(o_orderkey) AS last_keyset,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_keyset
        |  FROM keyset_page)
        |SELECT a.*, b.*,
        |  n_offset = n_keyset AND first_offset = first_keyset
        |    AND last_offset = last_keyset AND sum_offset = sum_keyset
        |    AS equivalent
        |FROM a CROSS JOIN b""".stripMargin,
  )
}
