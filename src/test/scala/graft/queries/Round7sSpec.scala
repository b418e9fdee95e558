package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 61: semantic-leakage conservation and the
  * Simpson's flag definition.
  */
class Round7sSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d38: cells conserve the d10 pair count; leaky = off-diagonal") {
    val cells = graft.SparkEntry.queries("d38_semantic_leakage")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    val total = graft.SparkEntry.queries("d10_embedding_lsh_pairs")(
      spark, Sf).count()
    assert(cells.map(_._3).sum == total)
    cells.foreach { case (a, b, _, leaky) => assert(leaky == (a != b)) }
  }

  test("q201: flag agrees with the slope signs; pooled constant") {
    val rows = graft.SparkEntry.queries("q201_simpsons_detector")(spark, Sf)
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 3)
    val pooled = rows.map(_._2).distinct
    assert(pooled.length == 1)
    rows.foreach { case (s, p, f) =>
      assert(f == (math.signum(s) != math.signum(p)))
    }
  }
}
