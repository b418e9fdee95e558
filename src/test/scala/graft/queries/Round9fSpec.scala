package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 102: HITS scaled-integer invariants. */
class Round9fSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("Hits.scores: star graph makes the center a pure hub") {
    val s = spark
    import s.implicits._
    val edges = Seq((0L, 1L, 5L), (0L, 2L, 5L), (0L, 3L, 10L))
      .toDF("src", "dst", "w")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node")
    val out = graft.operators.Hits.scores(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val scale = graft.operators.Hits.Scale
    assert(out(0L)._1 >= scale - 4 && out(0L)._2 === 0L)
    assert(out(1L)._1 === 0L && out(1L)._2 > 0L)
    assert(out(3L)._2 > out(1L)._2, "heavier edge -> more authority")
  }

  test("q257: non-negative scores, each side sums to ~Scale") {
    val rows = graft.SparkEntry.queries("q257_hits")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length === 25)
    rows.foreach { case (h, a) => assert(h >= 0L && a >= 0L) }
    val scale = graft.operators.Hits.Scale
    val (hs, as_) = (rows.map(_._1).sum, rows.map(_._2).sum)
    // Integer truncation can lose (never create) ~1 unit per node plus
    // the div-of-div slack; 1% tolerance is generous headroom.
    assert(hs <= scale * 101L / 100L && hs >= scale * 99L / 100L)
    assert(as_ <= scale * 101L / 100L && as_ >= scale * 99L / 100L)
  }
}
