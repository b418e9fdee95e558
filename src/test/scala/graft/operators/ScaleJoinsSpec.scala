package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleJoinsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("saltedJoin equals plain join on skewed data and spreads the hot key") {
    import spark.implicits._
    // 10k rows on one hot key + a tail of singletons.
    val left = ((1 to 10000).map(i => ("hot", s"v$i")) ++
      (1 to 50).map(i => (s"k$i", s"w$i"))).toDF("k", "payload")
    val right = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "dim")

    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = ScaleJoins.saltedJoin(left, right, Seq("k"), 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted === plain)
    assert(salted.size === 10050)

    // The hot key's rows really do carry >1 distinct salt.
    val salts = left.withColumn("_salt",
        pmod(xxhash64(left.columns.map(col): _*), lit(8)).cast("int"))
      .filter(col("k") === "hot").select("_salt").distinct().count()
    assert(salts > 4, s"hot key only spread over $salts salts")
  }

  test("bucketed tables join and aggregate with zero shuffle exchanges") {
    import spark.implicits._
    val li = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    // Clear any leftover managed-table locations from prior (failed) runs.
    for (tbl <- Seq("li_bucketed", "o_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    ScaleJoins.writeBucketed(li.select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8)
    ScaleJoins.writeBucketed(o.select("o_orderkey", "o_totalprice"),
      "o_bucketed", "o_orderkey", 8)

    // Force the sort-merge path (broadcast would hide the bucketing; at
    // real scale neither side broadcasts).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === li.count())

      // Aggregation on the bucket key is shuffle-free too.
      val agg = spark.table("li_bucketed").groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      assert(agg.count() === li.select("l_orderkey").distinct().count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
