package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed BPE learner against a straight sequential
  * implementation of the textbook algorithm (count pairs, merge the
  * argmax everywhere, repeat).
  */
class BpeLearnSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** sequential reference: word-frequency map in, ordered merges out */
  private def refLearn(words: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long)] = {
    var state = words.map { case (w, c) =>
      (w.split("").filter(_.nonEmpty).toSeq, c) }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (toks, c) =>
        toks.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq
          .minBy { case ((l, rr), c) => (-c, l, rr) }
        out += ((a, b, n))
        state = state.map { case (toks, c) =>
          val nt = Seq.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              nt += (a + b); i += 2
            } else { nt += toks(i); i += 1 }
          }
          (nt.result(), c)
        }
        r += 1
      }
    }
    out.result()
  }

  private val corpus = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
    "lowest" -> 4L, "newer" -> 2L, "wider" -> 1L, "new" -> 7L)

  test("learn matches the sequential reference for 8 rounds") {
    import spark.implicits._
    val words = corpus.toSeq.toDF("w", "cnt")
    val (merges, _) = BpeLearn.learn(words, 8)
    val ref = refLearn(corpus, 8)
    assert(merges.map(m => (m.left, m.right, m.count)) === ref)
  }

  test("final state re-concatenates to the original words") {
    import spark.implicits._
    val words = corpus.toSeq.toDF("w", "cnt")
    val (_, state) = BpeLearn.learn(words, 8)
    val bad = state
      .filter(concat_ws("", col("toks")) =!= col("w")).count()
    assert(bad === 0)
  }

  test("mergePair is greedy left-to-right and non-overlapping") {
    import spark.implicits._
    val df = Seq(
      ("aaa", Seq("aa", "a")),       // overlap: merged token can't chain
      ("aaaa", Seq("aa", "aa")),
      ("abab", Seq("ab", "ab")),
      ("ba", Seq("b", "a")),         // no occurrence
      ("a", Seq("a"))                // single token untouched
    ).toDF("w", "expect")
    val bad = df
      .select(BpeLearn.mergePair(
        BpeLearn.charTokens(col("w")), "a", "a").as("got"), col("expect"),
        col("w"))
      .filter(col("w").startsWith("a") && col("w") =!= "abab" &&
        col("got") =!= col("expect"))
      .count()
    assert(bad === 0)
    // pair (a,b) cases
    val df2 = Seq(
      ("abab", Seq("ab", "ab")),
      ("aabb", Seq("a", "ab", "b")),
      ("ba", Seq("b", "a"))
    ).toDF("w", "expect")
    val bad2 = df2
      .select(BpeLearn.mergePair(
        BpeLearn.charTokens(col("w")), "a", "b").as("got"), col("expect"))
      .filter(col("got") =!= col("expect"))
      .count()
    assert(bad2 === 0)
  }

  test("tie-breaking is lexicographic on (left, right) at equal count") {
    import spark.implicits._
    // "zz" and "aa" both appear exactly twice; "aa" must win
    val words = Seq(("zzx", 2L), ("aay", 2L)).toDF("w", "cnt")
    val (merges, _) = BpeLearn.learn(words, 1)
    assert(merges.head.left === "a" && merges.head.right === "a")
  }
}
