package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q103/q104/s7 batch: the reconciliation digest
  * finds exactly the injected drift, the decay weights obey their
  * power-of-two algebra, and the k-NN vote is well-formed.
  */
class Round5dSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q103: digest diff accounts for exactly the injected drift") {
    val rows = q("q103_bucket_reconcile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    // deletions only ever remove rows from replica B
    rows.foreach { case (b, nA, nB, status) =>
      assert(nA >= nB, s"bucket $b gained rows in the damaged replica")
      assert(status == (if (nA != nB) "count_skew" else "content_skew"))
    }
    // total count delta == number of key-hash-deleted rows
    val kh = Tables.t(spark, Sf, "orders")
      .select(graft.functions.Md5Pack(col("o_orderkey").cast("string"))
        .as("kh"))
    val deleted = kh.filter(col("kh") % 97 === 0).count()
    assert(rows.map(r => r._2 - r._3).sum === deleted)
    // every bucket holding a corrupted-but-not-deleted row must surface
    val corruptBuckets = kh
      .filter(col("kh") % 89 === 1 && col("kh") % 97 =!= 0)
      .select((col("kh") % 512).as("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(corruptBuckets.subsetOf(rows.map(_._1).toSet))
  }

  test("q104: decay bounded by raw sum and the 0.5^(age div 90) algebra") {
    val rows = q("q104_decay_halflife").collect()
    assert(rows.nonEmpty)
    val raw = Tables.t(spark, Sf, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ck = r.getLong(0)
      val dv = r.getDouble(2)
      assert(dv > 0.0 && dv <= raw(ck) + 1e-6,
        s"cust $ck decayed $dv outside (0, ${raw(ck)}]")
      // max age ~6.6y → smallest weight 0.5^26 > 0: every order contributes
      assert(dv >= raw(ck) * math.pow(0.5, 27) - 1e-9)
    }
  }

  test("q105: class sizes partition the table; flags match thresholds") {
    val rows = q("q105_k_anonymity").collect()
    val total = Tables.t(spark, Sf, "customer").count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      val (k, l) = (r.getLong(2), r.getLong(3))
      assert(l >= 1 && l <= k)
      assert(r.getBoolean(4) === (k >= 10))
      assert(r.getBoolean(5) === (l >= 3))
    }
  }

  test("q106: merged base+delta partials equal a direct full recompute") {
    val got = q("q106_incremental_agg").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val full = Tables.t(spark, Sf, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).cast("decimal(18,2)").as("p"))
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("p").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDecimal(3).doubleValue())).toMap
    assert(got.keySet === full.keySet)
    got.foreach { case (k, (n, s)) =>
      assert((n, s) === (full(k)._1, full(k)._2),
        s"group $k: incremental merge diverged from recompute")
    }
  }

  test("s8: K rows per probe; augmented-space ranking preserves MIPS order") {
    val rows = q("s8_mips").collect()
    val perProbe = rows.groupBy(_.getLong(0))
    perProbe.foreach { case (p, rs) =>
      assert(rs.length === 10, s"probe $p has ${rs.length} rows")
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to 10))
    }
    // the norm-augmentation reduction is order-preserving up to rounding
    // ties; on this data it is exact
    assert(rows.forall(_.getBoolean(5)), "augmented ranking diverged")
  }

  test("d22: chunk counts obey the stride formula; verdicts consistent") {
    val rows = q("d22_passage_dedup").collect()
    assert(rows.nonEmpty)
    val expected = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 16)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1) - 16) / 8 + 1)).toMap
    assert(rows.map(_.getLong(0)).toSet === expected.keySet)
    rows.foreach { r =>
      val (id, nc, nd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nc === expected(id).toLong, s"doc $id chunk count")
      assert(nd >= 0 && nd <= nc)
      assert(r.getBoolean(4) === (r.getDouble(3) < 0.5))
    }
  }

  test("s7: one vote row per probe, votes in 1..10, correct flag honest") {
    val rows = q("s7_knn_classify").collect()
    val nProbes = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull && col("vec_id") % 25 === 0)
      .count()
    assert(rows.length.toLong === nProbes)
    rows.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 10)
      assert(r.getBoolean(4) === (r.getInt(1) == r.getInt(2)))
    }
  }
}
