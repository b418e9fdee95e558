package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 46: fertility ratio floor, cluster
  * coherence pair counts, thumbnail membership.
  */
class Round7eSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("t30: BPE fertility >= 1 (regex splits at least at whitespace words)") {
    val rows = graft.SparkEntry.queries("t30_tokenizer_fertility")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 1.0, s"lang ${r.getString(0)} fertility < 1")
      assert(r.getDouble(6) > 0.0)
    }
  }

  test("s20: pair counts are n_members choose 2; cosines within [-1,1]") {
    val rows = graft.SparkEntry.queries("s20_cluster_coherence")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (m, p, c) =>
      assert(p == m * (m - 1) / 2, s"$m members but $p pairs")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("t65: Viterbi segmentations are feasible and never beaten by " +
      "the all-chars baseline") {
    val rows = graft.SparkEntry.queries("t65_unigram_viterbi")(spark, Sf)
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (w, toks, cost) = (r.getString(0), r.getLong(3), r.getLong(2))
      // a token covers 1..3 chars; costs are positive integers
      assert(toks >= (w.length + 2) / 3 && toks <= w.length,
        s"'$w': $toks tokens out of range")
      assert(cost >= toks, s"'$w': cost $cost under $toks tokens")
      assert(cost < 1000000000L, s"'$w': sentinel leaked into the DP")
    }
    val (words, tokens) = (rows.head.getLong(4), rows.head.getLong(5))
    assert(tokens >= words, "every word is at least one token")
  }

  test("m16: exactly one thumbnail per m9 scene, score = the scene's peak") {
    val scenes = graft.SparkEntry.queries("m9_scene_cuts")(spark, Sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getAs[Number](5).longValue)))
      .toMap
    val thumbs = graft.SparkEntry.queries("m16_scene_thumbnail")(spark, Sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Number](3).longValue, r.getLong(4))))
    assert(thumbs.length == scenes.size)
    thumbs.foreach { case (key, (score, nFrames)) =>
      val (expFrames, peak) = scenes(key)
      assert(score == peak, s"scene $key thumb score $score != peak $peak")
      assert(nFrames == expFrames)
    }
  }
}
