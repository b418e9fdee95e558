package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the distributed integer PageRank must agree
  * EXACTLY (same integers, not approximately) with an independent
  * single-threaded model on randomized graphs, and conserve mass up to
  * integer-truncation loss.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** Plain-Scala reference: same scaled-integer semantics, sequential. */
  private def reference(nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, Long] = {
    val n = nodes.length
    val init = PageRank.Scale / n
    val teleport = (PageRank.Scale * 15L / 100L) / n
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contrib = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d, w) =>
        contrib(d) += (r(s) * w) / outw(s)
      }
      val dang = nodes.filterNot(outw.contains).map(r).sum
      r = nodes.map(v =>
        v -> (teleport + (850L * (contrib(v) + dang / n)) / 1000L)).toMap
    }
    r
  }

  test("matches the sequential model exactly on randomized graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 8 + rnd.nextInt(8)
      val nodes = (0L until n.toLong).toSeq
      val edges = (0 until 3 * n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          (1 + rnd.nextInt(9)).toLong)
      }.distinct.filter { case (s, d, _) => s != d }
      val iters = 1 + rnd.nextInt(4)
      val got = PageRank.ranks(
          edges.toDF("src", "dst", "w"), nodes.toDF("id"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = reference(nodes, edges, iters)
      assert(got == want, s"trial $trial (n=$n, iters=$iters) diverged")
    }
  }

  test("mass conserves up to truncation loss; dangling nodes keep teleport+share") {
    import spark.implicits._
    // star graph: node 0 -> everyone, everyone else dangling
    val nodes = (0L to 9L).toDF("id")
    val edges = (1L to 9L).map(d => (0L, d, 1L)).toDF("src", "dst", "w")
    val got = PageRank.ranks(edges, nodes, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mass = got.values.sum
    assert(mass <= PageRank.Scale && mass > PageRank.Scale * 99 / 100,
      s"mass $mass out of band")
    // spokes all receive identically (symmetry), hub receives only the
    // dangling share + teleport
    val spokeRanks = (1L to 9L).map(got).toSet
    assert(spokeRanks.size == 1, "symmetric spokes diverged")
    assert(got(0L) < spokeRanks.head, "hub should rank below spokes here")
  }

  test("huge edge weights (rank·w past Long.MAX) run exactly via the decimal path") {
    import spark.implicits._
    // w = 1e9 with rank mass ~5e11 per node puts r·w ≈ 5e20 — 50× past
    // Long.MAX. The decimal(38,0) multiply must neither throw (ANSI)
    // nor wrap; the BigInt sequential model is the exact oracle.
    val nodes = (0L to 3L).toSeq
    val edges = Seq((0L, 1L, 1000000000L), (1L, 2L, 2000000000L),
      (2L, 0L, 1500000000L), (3L, 0L, 900000000L))
    val got = PageRank.ranks(
        edges.toDF("src", "dst", "w"), nodes.toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = nodes.length
    val init = BigInt(PageRank.Scale / n)
    val teleport = BigInt((PageRank.Scale * 15L / 100L) / n)
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> BigInt(es.map(_._3).sum) }
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to 3) {
      val contrib = collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
      edges.foreach { case (s, d, w) => contrib(d) += (r(s) * w) / outw(s) }
      val dang = nodes.filterNot(outw.contains).map(r).sum
      r = nodes.map(v =>
        v -> (teleport + (BigInt(850) * (contrib(v) + dang / n)) / 1000)).toMap
    }
    assert(got == r.map { case (k, v) => k -> v.toLong },
      "decimal-path ranks diverged from the BigInt model")
  }
}
