package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q116/s12/m11 batch: compaction batches are
  * contiguous and size-sane, MMR diversification actually re-ranks, and
  * the perceptual hash finds exactly the planted variants.
  */
class Round5kSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q116: batches partition each part's files contiguously, in order") {
    val rows = q("q116_compaction_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nFiles = Tables.t(spark, Sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey") % 40).distinct()
      .count()
    assert(rows.map(_._3).sum === nFiles, "batches do not partition files")
    rows.groupBy(_._1).foreach { case (part, bs) =>
      val sorted = bs.sortBy(_._2)
      // batch ids ascend with file ranges, ranges never overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 < b._5, s"$part batches overlap")
          assert(a._2 < b._2)
        case _ =>
      }
      // every batch holds its files' exact byte total
      assert(sorted.forall(b => b._4 > 0))
    }
  }

  test("s12: three distinct picks per probe; diversification re-ranks") {
    val rows = q("s12_mmr").collect()
    val perProbe = rows.groupBy(_.getLong(0))
    perProbe.foreach { case (p, rs) =>
      assert(rs.length === 3, s"probe $p pick count")
      assert(rs.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
      assert(rs.map(_.getLong(2)).distinct.length === 3,
        s"probe $p picked a duplicate")
      // rank-1 is pure relevance; later scores are penalized, so they
      // can never exceed it
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank(1) <= byRank(0) + 1e-9)
      assert(byRank(2) <= byRank(0) + 1e-9)
    }
    // on at least one probe, MMR's 2nd pick must differ from the 2nd-
    // most-relevant (otherwise the diversity term did nothing)
    val e = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull)
    val probes = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val rel2 = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("p_id"))
      .select(col("p_id"), col("vec_id").as("n_id"),
        round(graft.functions.GraftFunctions.cosineSim(
          col("p_emb"), col("embedding")), 6).as("rel"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("p_id")
          .orderBy(col("rel").desc, col("n_id"))))
      .filter(col("rn") === 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mmr2 = rows.filter(_.getInt(1) == 2)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(mmr2.exists { case (p, id) => rel2(p) != id },
      "MMR rank 2 identical to relevance rank 2 on every probe")
  }

  test("d24: ring rebalance moves a small minority; mod churns most") {
    val rows = q("d24_consistent_shards").collect()
    assert(rows.length === 8, "a ring shard received no documents")
    val (n, ring, mod) = (rows.map(_.getLong(1)).sum,
      rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(n === Tables.t(spark, Sf, "documents").count())
    // consistent hashing: ~2/10 of keys move when 8 shards become 10;
    // mod-N reassigns ~4/5 of them
    assert(ring.toDouble / n < 0.45, s"ring moved $ring of $n")
    assert(mod.toDouble / n > 0.6, s"mod moved only $mod of $n")
    assert(ring < mod)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("m11: all planted single-byte variants found at low Hamming") {
    val rows = q("m11_phash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull && col("doc_id") % 25 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    planted.foreach { id =>
      assert(rows.exists(p => p._1 == id && p._2 == id + 100000),
        s"planted pair $id not recovered")
    }
    rows.foreach { case (a, b, ham) =>
      assert(a < b)
      assert(ham >= 0 && ham <= 6)
    }
  }
}
