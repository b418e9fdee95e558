package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the t29/q153/q154 batch: token savings cohere
  * with the keep list, the migration matrix partitions the part union,
  * and staleness buckets tile the part set.
  */
class Round6hSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("t29: savings cohere with the d12 keep list") {
    val r = q("t29_dedup_token_savings").collect().head
    val (raw, kept, tokRaw, tokKept, savings) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    assert(raw === 500L)
    val keepCount = graft.SparkEntry.queries("d12_keep_list")(spark, Sf)
      .filter(col("keep")).count()
    assert(kept === keepCount)
    assert(kept < raw, "dedup removed nothing")
    assert(tokKept < tokRaw)
    assert(math.abs(savings - (1.0 - tokKept.toDouble / tokRaw)) < 1e-6)
    assert(savings > 0.0 && savings < 1.0)
  }

  test("q153: matrix covers every part exactly once") {
    val rows = q("q153_abc_migration").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nParts = Tables.t(spark, Sf, "lineitem")
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_._3).sum === nParts)
    assert(rows.forall { case (a, b, _) =>
      Set("A", "B", "C", "N")(a) && Set("A", "B", "C", "N")(b) })
    assert(!rows.exists { case (a, b, _) => a == "N" && b == "N" })
    // both periods are non-degenerate: each has at least class A mass
    assert(rows.exists(_._1 == "A") && rows.exists(_._2 == "A"))
  }

  test("q154: buckets tile the part table; capital adds up") {
    val rows = q("q154_dead_stock").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nParts = Tables.t(spark, Sf, "part").count()
    assert(rows.map(_._2).sum === nParts)
    assert(rows.map(_._1).distinct.length === rows.length)
    val totalCents = Tables.t(spark, Sf, "part")
      .agg(sum((col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long"))).collect().head.getLong(0)
    assert(rows.map(_._3).sum === totalCents)
    // recent demand exists: bucket 0 is populated
    assert(rows.exists(r => r._1 === 0 && r._2 > 0))
  }
}
