package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 90 (SURVEY.md §2.4):
  *
  *  - q244: order-independent table fingerprints — the
  *    replication-verification primitive (pt-table-checksum style):
  *    each row hashes over a canonical '|'-joined rendering of its
  *    columns, and the table digest is the SUM of row hashes mod
  *    2^61−1 — commutative, so any partitioning/order yields the same
  *    digest, and two engines can compare tables without moving them.
  *    Only integer and string columns participate (float rendering is
  *    engine-specific, so it is excluded from the canonical form by
  *    design). One scan per table, map-side combinable.
  */
object Analytics81 {
  import Tables.t

  private val Mod = 2305843009213693951L // 2^61 - 1

  private def rowHash(cols: Column*): Column =
    pmod(graft.functions.Md5Pack(concat_ws("|", cols: _*)), lit(Mod))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_table_fingerprint" -> ((spark, dir) => {
      def fp(name: String, df: DataFrame, cols: Column*): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            (sum(rowHash(cols: _*).cast("decimal(38,0)"))
              % lit(Mod).cast("decimal(38,0)")).cast("long")
              .as("fingerprint"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("fingerprint"))
      fp("nation", t(spark, dir, "nation"),
          col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .unionByName(fp("region", t(spark, dir, "region"),
          col("r_regionkey"), col("r_name")))
        .unionByName(fp("supplier", t(spark, dir, "supplier"),
          col("s_suppkey"), col("s_name"), col("s_nationkey")))
        .unionByName(fp("customer", t(spark, dir, "customer"),
          col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_mktsegment")))
        .orderBy("table_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q244_table_fingerprint" -> {
      val M = Mod
      def fp(name: String, table: String, cols: Seq[String]) = {
        val cc = cols.map(c => s"CAST($c AS VARCHAR)").mkString(", ")
        s"""SELECT '$name' AS table_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(CAST(sum((${Tables.duckMd5Pack(s"concat_ws('|', $cc)")})
           |    % $M) AS HUGEINT) % $M AS BIGINT) AS fingerprint
           |FROM $table""".stripMargin
      }
      Seq(
        fp("nation", "nation",
          Seq("n_nationkey", "n_name", "n_regionkey")),
        fp("region", "region", Seq("r_regionkey", "r_name")),
        fp("supplier", "supplier",
          Seq("s_suppkey", "s_name", "s_nationkey")),
        fp("customer", "customer",
          Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },
  )
}
