package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 112: chi-squared independence and SCC. */
class Round9mSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q267: chi2 stats are well-formed, dof = (r-1)(c-1)") {
    val r = graft.SparkEntry.queries("q267_chi_squared")(spark, Sf)
      .collect().head
    val (chi2, dof, n, v) =
      (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(chi2 >= 0.0)
    assert(dof === 8L, "3 statuses x 5 priorities -> dof 8")
    assert(n > 0)
    assert(v >= 0.0 && v <= 1.0, "Cramer's V is in [0,1]")
  }

  test("q268: labels are canonical minima and sizes are consistent") {
    val rows = graft.SparkEntry.queries("q268_scc")(spark, Sf)
      .collect().map(r => (r.getString(0),
        r.getAs[Number](1).longValue(), r.getAs[Number](2).longValue()))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length,
      "one row per nation in the sparse graph")
    // Component sizes must equal the actual label multiplicities.
    val bySize = rows.groupBy(_._2).map { case (id, g) => id -> g.length }
    rows.foreach { case (_, id, size) =>
      assert(size === bySize(id).toLong, "scc_size matches label count")
    }
  }

  test("TransitiveClosure: scc labels on a known digraph") {
    import spark.implicits._
    // 1->2->3->1 is a cycle; 4 hangs off it; 5->6, 6->5 a 2-cycle.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L),
      (6L, 5L)).toDF("s", "d")
    val got = graft.operators.TransitiveClosure.sccLabels(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
      6L -> 5L))
  }
}
