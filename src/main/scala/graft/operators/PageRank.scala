package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank with uniform dangling-mass redistribution, in exact
  * scaled-integer arithmetic (rank units of 1e-12).
  *
  * Why integers: chained float iterations are not reproducible across
  * engines/partitionings — `round(double, 9)` half-way ties resolve
  * differently between decimal-string rounding (JVM) and binary rounding
  * (C engines), and one flipped ulp compounds through every later
  * iteration. With ranks as BIGINT units, damping as ×850 `div` 1000 and
  * contributions as `(r·w) div out_w`, every step is pure integer
  * arithmetic: bit-identical on any engine, any partitioning, any
  * iteration count. Truncation can only LOSE mass (bounded by 1 unit per
  * edge/node per step), never create it — the conservation test in
  * PageRankSpec pins that.
  *
  * Scale shape: callers CONDENSE the graph first (aggregate the fact
  * table to an edge list); the iterations then run on node/edge-bounded
  * frames where every rank join broadcasts. The rank·w multiply runs in
  * DECIMAL(38,0) (headroom to ~1e38), so per-edge weights up to ~1e26
  * are safe — BIGINT would have overflowed at w ≈ 9e6 with rank mass
  * ~1e12 on a node.
  */
object PageRank {

  /** Total rank mass: ranks start at Scale/|nodes| and sum to ~Scale. */
  val Scale: Long = 1000000000000L

  /** @param edges  (src, dst, w) weighted directed edge frame
    * @param nodes  single-column frame of all node ids (superset of the
    *               edge endpoints; isolated nodes keep teleport rank)
    * @param iters  unrolled iteration count
    * @return (node, r) with r in units of Scale⁻¹ (BIGINT)
    */
  def ranks(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val nodeCol = nodes.columns.head
    val n = nodes.count()
    require(n > 0, "empty node set")
    val init = Scale / n
    val teleport = (Scale * 15L / 100L) / n
    // Condense ONCE: without the eager checkpoint, every iteration's
    // lineage re-embeds the (possibly fact-scale) edge aggregation —
    // PLAN_SURVEY caught q64's plan repeating the 4-way join ~9×. The
    // checkpointed edge list is nodes²-bounded, so this is cheap at any
    // corpus size; the same lineage-truncation recipe as
    // ConnectedComponents.
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(true)
    val outw = e.groupBy("src").agg(sum(col("w")).cast("long").as("out_w"))
    var ranks = nodes.select(col(nodeCol).as("node")).withColumn("r", lit(init))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(broadcast(ranks), col("node") === col("src"))
        .join(broadcast(outw), "src")
        // The multiply runs in DECIMAL(38,0): rank mass is ≤ Scale (1e12)
        // per node, so r·w as BIGINT would overflow once per-edge weights
        // reach ~9e6 (ANSI mode throws mid-iteration). DECIMAL(38,0) holds
        // to r·w ≈ 1e38; the `div` truncates back to BIGINT with identical
        // semantics wherever BIGINT wouldn't have overflowed.
        .select(col("dst"),
          expr("(cast(r as decimal(38,0)) * w) div out_w").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      // rank parked on nodes without out-edges redistributes uniformly —
      // without this, dangling nodes leak 85% of their mass every step
      val dang = ranks
        .join(broadcast(outw), col("node") === col("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      // ranks feeds TWO consumers next round (contrib + dangling scan):
      // unchecked, the lineage doubles per iteration. Node-count-sized
      // frame, so the eager checkpoint is constant cost.
      ranks = nodes.select(col(nodeCol).as("node"))
        .join(broadcast(contrib), col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(teleport) +
            expr(s"(850 * (coalesce(s, 0) + dang div $n)) div 1000")).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }
}
