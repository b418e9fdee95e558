package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 107: betweenness centrality. */
class Round9iSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q261: non-negative, and total mass equals sum of (dist-1) over pairs") {
    val b = graft.SparkEntry.queries("q261_betweenness")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(b.nonEmpty)
    b.foreach { case (_, v) => assert(v >= 0.0) }
    assert(b.exists(_._2 > 0.0), "some node must broker a shortest path")
    // Identity: sum_v B(v) = sum_{s<t} (d_st - 1), because each {s,t}
    // pair distributes exactly d-1 units of interior mass across its
    // shortest paths. The right side comes from q259's per-source
    // distance sums (each unordered pair counted twice there).
    val c = graft.SparkEntry.queries("q259_closeness")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val dist = graft.operators.BfsHops
      .allPairs(Analytics89.sparseNationEdges(spark, Sf), "a", "b")
      .collect().map(r => r.getLong(2))
    val lhs = b.map(_._2).sum
    val rhs = (dist.filter(_ > 0).map(_ - 1).sum) / 2.0
    assert(math.abs(lhs - rhs) < 1e-3, s"mass $lhs vs pair sum $rhs")
    assert(c.nonEmpty) // q259 exercised alongside
  }
}
