package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 108: SNM dedup and the critical path. */
class Round9jSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d50: every window pair exactly once, scores bounded") {
    val rows = graft.SparkEntry.queries("d50_sorted_neighborhood")(
      spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$Sf/documents.parquet")
      .filter("text IS NOT NULL").count().toInt
    // sum over sorted positions of min(4, N - pos) = 4N - 10 for N >= 5
    assert(rows.length === 4 * n - 10)
    assert(rows.map(p => (p._1, p._2)).distinct.length === rows.length)
    rows.foreach { case (a, b, dist, j, m) =>
      assert(a !== b)
      assert(dist >= 1 && dist <= 4)
      assert(j >= 0.0 && j <= 1.0)
      assert(m === (j >= 0.5))
    }
  }

  test("q262: DAG longest paths start at zero, one critical sink mass") {
    val rows = graft.SparkEntry.queries("q262_critical_path")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.length === 25)
    val crit = rows.head._3
    assert(rows.map(_._2).max === crit)
    assert(rows.map(_._2).min === 0L, "the lowest-key node has no in-edges")
    assert(crit > 0L)
    rows.foreach { case (_, lp, c, sink) =>
      assert(c === crit)
      assert(sink === (lp == crit))
    }
  }
}
