package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Completeness proof-by-test for the prefix-filter similarity join:
  * against a brute-force all-pairs scan it must return EXACTLY the
  * pairs with Jaccard ≥ τ — the prefix prune may never drop a
  * qualifying pair (the PPJoin theorem), and the verify step may never
  * let an unqualified candidate through.
  */
class PrefixSimilarityJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic corpus: overlapping token sets of varied
    * size, including exact duplicates, near-duplicates, disjoint sets,
    * and a shared stopword-like token present everywhere.
    */
  private def corpus: Seq[(Long, Seq[String])] = {
    val vocab = ('a' to 't').map(_.toString)
    (0L until 30L).map { i =>
      val base = (0 until 6).map(j => vocab(((i * 3 + j * 5) % 20).toInt))
      val extra = if (i % 3 == 0) Seq(vocab((i % 20).toInt)) else Nil
      // "common" appears in every set — the degenerate token the bucket
      // cap must survive (cap is set above corpus size here so no pair
      // is dropped and completeness stays exact).
      i -> (base ++ extra :+ "common").distinct
    }
  }

  private def bruteForce(tau: Double): Set[(Long, Long, Double)] = {
    val c = corpus.map { case (id, s) => id -> s.toSet }
    (for {
      (a, sa) <- c; (b, sb) <- c if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= tau
    } yield (a, b, j)).toSet
  }

  for (tau <- Seq(0.3, 0.5, 0.8)) {
    test(s"prefix filtering finds exactly the brute-force pairs at tau=$tau") {
      val df = corpus.toDF("id", "tokens")
        .select(col("id"), array_distinct(col("tokens")).as("tokens"))
      val got = PrefixSimilarityJoin.pairs(df, "id", "tokens", tau, 100)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == bruteForce(tau))
    }
  }

  test("randomized corpora: exact brute-force agreement across trials and taus") {
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 3) {
      val vocabSize = 12 + rnd.nextInt(20)
      val vocab = (0 until vocabSize).map(i => s"w$i")
      val docs = (0L until (20L + rnd.nextInt(20))).map { i =>
        val sz = 2 + rnd.nextInt(8)
        i -> Seq.fill(sz)(vocab(rnd.nextInt(vocabSize))).distinct
      }
      val tau = Seq(0.25, 0.4, 0.6)(rnd.nextInt(3))
      val df = docs.toDF("id", "tokens")
      val got = PrefixSimilarityJoin.pairs(df, "id", "tokens", tau, 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val c = docs.map { case (id, s) => id -> s.toSet }
      val want = (for {
        (a, sa) <- c; (b, sb) <- c if a < b
        if sa.intersect(sb).size.toDouble / sa.union(sb).size >= tau
      } yield (a, b)).toSet
      assert(got == want, s"trial $trial (tau=$tau, vocab=$vocabSize) diverged")
    }
  }

  test("the bucket cap drops degenerate buckets whole, never partially") {
    // With the cap below the "common"-token bucket size, pairs that rely
    // ONLY on the shared stopword disappear, but pairs sharing a rarer
    // prefix token must all survive.
    val df = corpus.toDF("id", "tokens")
    val capped = PrefixSimilarityJoin.pairs(df, "id", "tokens", 0.3, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = bruteForce(0.3).map(t => (t._1, t._2))
    assert(capped.subsetOf(full), "cap introduced a false pair")
  }
}
