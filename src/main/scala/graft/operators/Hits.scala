package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted HITS (hubs & authorities) in exact scaled-integer
  * arithmetic — the mutually-recursive complement of [[PageRank]]: a
  * node is a good hub if it points at good authorities, a good
  * authority if good hubs point at it.
  *
  * Same reproducibility stance as PageRank: chained float iterations
  * are not replayable across engines, so scores are BIGINT units of
  * Scale⁻¹, every product runs in DECIMAL(38,0) headroom, and each
  * half-step L1-normalizes with pure integer division
  * `x div (total div Scale)` — truncation toward zero on positive
  * values in both engines, bit-identical on any partitioning.
  *
  * Scale shape: callers condense the graph to an edge list first; each
  * half-step is one broadcast join + one map-side-combinable sum over
  * edges, score frames are node-bounded, and each iteration ends in an
  * eager localCheckpoint (scores feed two consumers next round).
  */
object Hits {

  /** L1 mass after each normalization (score units of Scale⁻¹). */
  val Scale: Long = 1000000000L

  /** @param edges (src, dst, w) weighted directed edge frame
    * @param nodes single-column frame of all node ids
    * @param iters unrolled iteration count
    * @return (node, hub, authority) — BIGINT scores, each half-step
    *         normalized so scores sum to ~Scale (integer truncation
    *         can only lose mass, never create it)
    */
  def scores(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val nodeCol = nodes.columns.head
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(true)
    val ns = nodes.select(col(nodeCol).as("node")).localCheckpoint(true)
    var hub = ns.withColumn("h", lit(Scale))
    var auth = ns.withColumn("a", lit(Scale))
    for (_ <- 1 to iters) {
      // authority ← in-edge hub mass
      val araw = e
        .join(broadcast(hub), col("node") === col("src"))
        .select(col("dst"),
          expr("cast(h as decimal(38,0)) * w").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("araw"))
      val atot = araw.agg(sum(col("araw")).as("ta"))
      auth = ns
        .join(broadcast(araw), col("node") === col("dst"), "left")
        .crossJoin(broadcast(atot))
        .select(col("node"),
          expr(s"cast(coalesce(araw, 0) div (ta div $Scale) as bigint)")
            .as("a"))
        .localCheckpoint(true)
      // hub ← out-edge authority mass
      val hraw = e
        .join(broadcast(auth), col("node") === col("dst"))
        .select(col("src"),
          expr("cast(a as decimal(38,0)) * w").as("c"))
        .groupBy("src").agg(sum(col("c")).as("hraw"))
      val htot = hraw.agg(sum(col("hraw")).as("th"))
      hub = ns
        .join(broadcast(hraw), col("node") === col("src"), "left")
        .crossJoin(broadcast(htot))
        .select(col("node"),
          expr(s"cast(coalesce(hraw, 0) div (th div $Scale) as bigint)")
            .as("h"))
        .localCheckpoint(true)
    }
    hub.join(auth, "node")
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }
}
