package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 117: sequence mining, SPRT, silhouette. */
class Round9rSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q276: subsequence supports obey the apriori monotonicity") {
    val rows = graft.SparkEntry.queries("q276_seq_patterns")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val l2 = rows.filter(_._2 == 2).map(r => r._1 -> r._3).toMap
    val nUsers = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    rows.filter(_._2 == 3).foreach { case (p, _, supp) =>
      val parts = p.split(">")
      // Any reported 3-pattern's support cannot exceed a contained
      // 2-pattern's TRUE support; the 2-pattern may have been filtered
      // out only if its support were lower — impossible — so when the
      // prefix/suffix 2-pattern is present, compare directly.
      Seq(s"${parts(0)}>${parts(1)}", s"${parts(1)}>${parts(2)}",
        s"${parts(0)}>${parts(2)}").foreach { sub =>
        l2.get(sub).foreach(s2 => assert(supp <= s2,
          s"$p support $supp exceeds $sub support $s2"))
      }
      assert(supp * 4 >= nUsers, "threshold respected")
    }
  }

  test("q277: the walk stops at a boundary consistent with its decision") {
    val r = graft.SparkEntry.queries("q277_sprt")(spark, Sf)
      .collect().head
    val (nObs, nSucc, stopN, stopLlr, decision) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))
    assert(nSucc <= nObs)
    assert(stopN >= 1 && stopN <= nObs, "crossing happens inside the stream")
    assert(math.abs(stopLlr) >= math.log(99.0) - 1e-9,
      "stopped at or beyond a Wald boundary")
    assert((decision == "accept_h1") === (stopLlr > 0))
  }

  test("s33: silhouettes are in [-1, 1] and clusters cover all vectors") {
    val rows = graft.SparkEntry.queries("s33_silhouette")(spark, Sf)
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, s) =>
      assert(n > 0)
      assert(s >= -1.0 && s <= 1.0, s"silhouette $s out of range")
    }
    val nVec = spark.read.parquet(s"$Sf/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .count()
    assert(rows.map(_._2).sum === nVec)
  }
}
