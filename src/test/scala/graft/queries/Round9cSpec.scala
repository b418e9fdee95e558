package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 99: k-core peeling and the local
  * clustering coefficient on the sparse nation graph.
  */
class Round9cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("KCore.peel: pendant peels in round 1, triangle survives k=2") {
    val s = spark
    import s.implicits._
    // Triangle 1-2-3 plus pendant 4 hanging off node 1.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = graft.operators.KCore.peel(edges, "a", "b", k = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(4L) === Some(1L))
    assert(out(1L).isEmpty && out(2L).isEmpty && out(3L).isEmpty)
  }

  test("q255: core nodes keep >= 10 sparse-graph neighbors; layers valid") {
    val core = graft.SparkEntry.queries("q255_kcore")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(core.nonEmpty)
    core.foreach { case (_, inCore, round) =>
      assert(inCore === round.isEmpty)
      round.foreach(r => assert(r >= 1L))
    }
    assert(core.exists(_._2), "expected a non-empty 10-core")
    assert(core.exists(!_._2), "expected at least one peeled node")
    // Full-graph degree bounds the core degree from above: every core
    // member must show degree >= 10 in q256's per-node census.
    val deg = graft.SparkEntry.queries("q256_clustering_coeff")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    core.filter(_._2).foreach { case (name, _, _) =>
      assert(deg(name) >= 10L, s"core node $name has degree ${deg(name)}")
    }
  }

  test("q256: lcc in [0,1], triangle count bounded, NULL iff deg < 2") {
    val rows = graft.SparkEntry.queries("q256_clustering_coeff")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (d, tri, lcc) =>
      assert(tri <= d * (d - 1) / 2)
      if (d < 2) assert(lcc.isEmpty)
      else {
        assert(lcc.nonEmpty)
        assert(lcc.get >= 0.0 && lcc.get <= 1.0)
        assert(math.abs(lcc.get - 2.0 * tri / (d * (d - 1))) < 1e-5)
      }
    }
  }
}
