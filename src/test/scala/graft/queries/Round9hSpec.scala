package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 106: all-pairs BFS and modularity. */
class Round9hSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("BfsHops.allPairs: path graph distances and symmetry") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val d = graft.operators.BfsHops.allPairs(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(d((1L, 3L)) === 2L && d((3L, 1L)) === 2L)
    assert(d((1L, 2L)) === 1L && d((2L, 2L)) === 0L)
    assert(d.size === 9, "3 sources x 3 reachable nodes")
  }

  test("q259: ecc bounded by diameter, closeness in (0,1]") {
    val rows = graft.SparkEntry.queries("q259_closeness")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4)))
    assert(rows.nonEmpty)
    val diam = rows.head._4
    assert(rows.map(_._2).max === diam, "diameter = max eccentricity")
    rows.foreach { case (reach, ecc, close, d) =>
      assert(d === diam)
      assert(ecc <= diam && reach >= 1)
      close.foreach(c => assert(c > 0.0 && c <= 1.0))
    }
  }

  test("q260: degree identity and bounded modularity, constant per row") {
    val rows = graft.SparkEntry.queries("q260_modularity")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val q = rows.head._3
    rows.foreach { case (intra, deg, m) =>
      assert(intra * 2 <= deg, "intra edges contribute twice to degree")
      assert(m === q, "global Q repeated on every region row")
    }
    assert(q >= -0.5 && q <= 1.0, s"modularity out of range: $q")
    // Degrees across regions double-count every edge exactly once per
    // endpoint: sum(deg) = 2W, and W >= sum(intra).
    assert(rows.map(_._1).sum <= rows.map(_._2).sum / 2)
  }
}
