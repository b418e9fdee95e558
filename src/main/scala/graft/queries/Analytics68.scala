package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 75 (SURVEY.md §2.4):
  *
  *  - q226: referential-integrity census — every foreign-key edge in
  *    the schema checked in one pass each: child rows whose FK value
  *    has no parent (orphans) and, for the fact edges, parents with no
  *    children (childless). Each check is one left-anti join on the
  *    key (dimension sides broadcast); results union into the one-row-
  *    per-edge DQ report a warehouse gate consumes. All-zero orphans
  *    is the expected testdata contract — the query exists so a drifted
  *    regeneration fails loudly.
  */
object Analytics68 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q226_fk_orphans" -> ((spark, dir) => {
      def edge(name: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String): DataFrame = {
        val orphans = child
          .join(broadcast(parent.select(col(parentKey))),
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val total = child.agg(count(lit(1)).as("n_child_rows"))
        orphans.crossJoin(total).select(lit(name).as("fk_edge"),
          col("n_child_rows"), col("n_orphans"))
      }
      val li = t(spark, dir, "lineitem")
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
      val s = t(spark, dir, "supplier")
      val p = t(spark, dir, "part")
      val n = t(spark, dir, "nation")
      val r = t(spark, dir, "region")
      edge("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(edge("lineitem.partkey->part", li, "l_partkey",
          p, "p_partkey"))
        .unionByName(edge("lineitem.suppkey->supplier", li, "l_suppkey",
          s, "s_suppkey"))
        .unionByName(edge("orders.custkey->customer", o, "o_custkey",
          c, "c_custkey"))
        .unionByName(edge("customer.nationkey->nation", c, "c_nationkey",
          n, "n_nationkey"))
        .unionByName(edge("supplier.nationkey->nation", s, "s_nationkey",
          n, "n_nationkey"))
        .unionByName(edge("nation.regionkey->region", n, "n_regionkey",
          r, "r_regionkey"))
        .orderBy("fk_edge")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q226_fk_orphans" -> {
      def edge(name: String, child: String, childKey: String,
          parent: String, parentKey: String): String =
        s"""SELECT '$name' AS fk_edge,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child_rows,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent
           |                     WHERE $parentKey = $childKey)) AS n_orphans"""
          .stripMargin
      Seq(
        edge("lineitem.orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("lineitem.partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        edge("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edge("orders.custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("customer.nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edge("supplier.nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        edge("nation.regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
    },
  )
}
