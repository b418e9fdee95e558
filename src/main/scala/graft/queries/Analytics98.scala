package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 115 (SURVEY.md §2.4):
  *
  *  - q273: EWMA trend per region (finite-window-debiased, α = 1/2) —
  *    the smoothed-monitoring complement of q92's CUSUM: each month's
  *    smoothed revenue is the dyadic-weighted mean Σ 2^−k·x over all
  *    preceding months (k = month gap). Monthly sums collapse the fact
  *    scan first, so the weighting runs on the SF-INDEPENDENT
  *    region×month frame; 2^−k is IEEE-exact in both engines, each
  *    term is rounded→DECIMAL before the order-free sum (the q261
  *    discipline), and only the final ratio is a rounded double.
  *  - q274: grid-blocked DBSCAN over the md5-coordinate customer
  *    points (eps=400, minPts=4): neighbor pairs via q270-style cell
  *    blocking (exact integer d² ≤ eps² verify), core = neighbor
  *    count ≥ minPts (self included), border points adopt their
  *    minimum neighboring core's cluster, everything else is noise.
  *    The clustering step is the classic grid-DBSCAN reduction: with
  *    cell size eps/√2 every two points in ONE cell are provably
  *    within eps, so point-level core connectivity equals CELL-level
  *    connectivity — and the cell graph is GEOMETRY-bounded (≤ ~37²
  *    cells whatever the corpus size), so its components are a
  *    constant-size driver union-find (the IVF-centroid class of
  *    justified collect) instead of an O(diameter)-round label
  *    propagation over the point graph. The oracle replays the
  *    equivalent point-level definition recursively.
  */
object Analytics98 {
  import Tables.t

  private val Eps = 400L
  private val MinPts = 4L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q273_ewma" -> ((spark, dir) => {
      val monthly = t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"),
          trunc(col("o_orderdate"), "month").as("mon"))
        .join(t(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(spark, dir, "region")
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "mon")
        // o_totalprice is a parquet DOUBLE — quantize per row to
        // DECIMAL(18,2) so the monthly sum is exact and order-free.
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .localCheckpoint(true) // region×month-bounded; feeds both join sides
      // Bounded self-join (months² per region, SF-independent): every
      // (target month, contributing month ≤ target) pair carries its
      // dyadic weight; terms round→DECIMAL so the sum is order-free.
      val pairs = monthly.as("cur")
        .join(monthly.as("past"),
          col("cur.r_name") === col("past.r_name")
            && col("past.mon") <= col("cur.mon"))
        .withColumn("k",
          floor(months_between(col("cur.mon"), col("past.mon"))).cast("int"))
        .select(col("cur.r_name").as("r_name"), col("cur.mon").as("mon"),
          col("cur.rev").as("rev"),
          expr("cast(round(cast(past.rev as double) * power(0.5, k), 6) " +
            "as decimal(38,6))").as("num_term"),
          expr("cast(round(power(0.5, k), 12) as decimal(38,12))")
            .as("den_term"))
      pairs.groupBy("r_name", "mon")
        .agg(max(col("rev")).as("rev"),
          sum(col("num_term")).as("num"), sum(col("den_term")).as("den"))
        .select(col("r_name"), col("mon"),
          round(col("rev").cast("double"), 2).as("revenue"),
          // 2-decimal (money-scale) rounding: at ~1e7 magnitudes a
          // 6-decimal round sits inside double-ulp territory and the
          // engines' tie conventions diverge; at 2 decimals the
          // boundary is 5 orders above ulp.
          round(col("num").cast("double") / col("den").cast("double"), 2)
            .as("ewma"))
        .orderBy("r_name", "mon")
    }),

    "q274_dbscan" -> ((spark, dir) => {
      // Cell size g = floor(eps/√2): two points in one cell sit at most
      // g·√2 ≤ eps apart — the invariant the cell-graph reduction needs.
      val G = 282L
      // Candidate fan-out: cells within ceil(eps/g) = 2 in each axis.
      val F = 2L
      def coord(salt: String, key: org.apache.spark.sql.Column) =
        graft.functions.Md5Pack(concat(lit(salt), key.cast("string"))) % 10000L
      val pts = t(spark, dir, "customer")
        .select(col("c_custkey").as("pid"))
        .withColumn("x", coord("pt_x_", col("pid")))
        .withColumn("y", coord("pt_y_", col("pid")))
        .withColumn("cx", expr(s"x div $G"))
        .withColumn("cy", expr(s"y div $G"))
        .localCheckpoint(true) // probe + build sides of the cell join
      val builds = pts
        .select(col("pid").as("qid"), col("x").as("qx"), col("y").as("qy"),
          col("cx").as("qcx"), col("cy").as("qcy"),
          explode(sequence(col("cx") - F, col("cx") + F)).as("cx"))
        .select(col("qid"), col("qx"), col("qy"), col("qcx"), col("qcy"),
          col("cx"),
          explode(sequence(col("qcy") - F, col("qcy") + F)).as("cy"))
      // Within-eps pairs, self included (pid = qid at distance 0) — so
      // the neighbor count matches DBSCAN's |N_eps(p)| convention.
      val pairs = pts.join(builds, Seq("cx", "cy"))
        .filter((col("x") - col("qx")) * (col("x") - col("qx"))
          + (col("y") - col("qy")) * (col("y") - col("qy")) <= Eps * Eps)
        .select(col("pid"), col("qid"),
          (col("cx") * 1000 + col("cy")).as("cell"),
          (col("qcx") * 1000 + col("qcy")).as("qcell"))
        .localCheckpoint(true) // feeds degree, cell edges, border adoption
      val deg = pairs.groupBy("pid").agg(count(lit(1)).as("deg"))
      val core = deg.filter(col("deg") >= MinPts).select(col("pid"))
        .localCheckpoint(true)
      // Cell contact graph: symmetric by pair symmetry, self-loops keep
      // lone core cells as closure nodes. GEOMETRY-bounded: ≤ ~36² nodes
      // at any corpus size.
      val corePairs = pairs
        .join(core, "pid")
        .join(core.select(col("pid").as("qid")), "qid")
        .localCheckpoint(true) // cell edges + the core cell map
      val cellEdges = corePairs.select(col("cell"), col("qcell")).distinct()
      // The cell contact graph is GEOMETRY-bounded: ≤ (10000/G + 1)² ≈
      // 37² nodes and ≤ 25 neighbors each, WHATEVER the corpus size —
      // so its components are a constant-size driver computation (the
      // same justified-constant collect as the IVF centroid frame; a
      // path-doubling closure here composes ~cells³ rows per round,
      // measured 216 s at sf0.1 vs <0.1 s for this union-find).
      val edgeArr = cellEdges.collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      require(edgeArr.length <= 200000,
        s"cell graph unexpectedly large (${edgeArr.length} edges) — " +
          "the eps grid bound no longer holds")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent.update(x, r); r }
      }
      edgeArr.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.update(math.max(ra, rb), math.min(ra, rb))
      }
      // Component id per cell → cluster id = min CORE pid in the
      // component (matches the oracle's point-level min labeling).
      val cellComp = {
        import spark.implicits._
        edgeArr.flatMap { case (a, b) => Seq(a, b) }.distinct
          .map(c => (c, find(c))).toSeq.toDF("cell", "comp")
      }
      val coreCells = corePairs.filter(col("pid") === col("qid"))
        .select(col("pid"), col("cell"))
      val compMin = coreCells.join(broadcast(cellComp), "cell")
        .groupBy("comp").agg(min(col("pid")).as("cluster"))
      val coreLabel = coreCells
        .join(broadcast(cellComp), "cell")
        .join(broadcast(compMin), "comp")
        .select(col("pid"), col("cluster"))
        .localCheckpoint(true) // reused by the border adoption join
      val borderLabel = pairs
        .join(coreLabel.select(col("pid").as("qid"),
          col("cluster").as("qcluster")), "qid")
        .join(core, Seq("pid"), "left_anti")
        .groupBy("pid").agg(min(col("qcluster")).as("cluster"))
      pts
        .join(coreLabel.withColumnRenamed("cluster", "core_cluster"),
          Seq("pid"), "left")
        .join(borderLabel.withColumnRenamed("cluster", "border_cluster"),
          Seq("pid"), "left")
        .select(col("pid"),
          when(col("core_cluster").isNotNull, "core")
            .when(col("border_cluster").isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce(col("core_cluster"), col("border_cluster")).as("cluster"))
        .orderBy("pid")
    }),
  )

  private def duckCoord(salt: String, key: String) =
    s"(${Tables.duckMd5Pack(s"'$salt' || CAST($key AS VARCHAR)")} % 10000)"

  val oracleSql: Map[String, String] = Map(
    "q273_ewma" -> """
      WITH monthly AS (
        SELECT r_name, date_trunc('month', o_orderdate) AS mon,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
      pairs AS (
        SELECT cur.r_name, cur.mon, cur.rev,
          CAST(round(CAST(past.rev AS DOUBLE)
            * power(0.5, datediff('month', past.mon, cur.mon)), 6)
            AS DECIMAL(38,6)) AS num_term,
          CAST(round(power(0.5, datediff('month', past.mon, cur.mon)), 12)
            AS DECIMAL(38,12)) AS den_term
        FROM monthly cur
        JOIN monthly past
          ON cur.r_name = past.r_name AND past.mon <= cur.mon)
      SELECT r_name, mon,
        round(CAST(max(rev) AS DOUBLE), 2) AS revenue,
        round(CAST(sum(num_term) AS DOUBLE)
          / CAST(sum(den_term) AS DOUBLE), 2) AS ewma
      FROM pairs GROUP BY r_name, mon
      ORDER BY r_name, mon""",

    "q274_dbscan" -> s"""
      WITH RECURSIVE pts AS (
        SELECT c_custkey AS pid,
          ${duckCoord("pt_x_", "c_custkey")} AS x,
          ${duckCoord("pt_y_", "c_custkey")} AS y
        FROM customer),
      pairs AS (
        SELECT a.pid, b.pid AS qid
        FROM pts a JOIN pts b
          ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= ${Eps * Eps}),
      core AS (
        SELECT pid FROM pairs GROUP BY pid
        HAVING count(*) >= $MinPts),
      ce AS (
        SELECT p.pid AS a, p.qid AS b FROM pairs p
        SEMI JOIN core c1 ON p.pid = c1.pid
        SEMI JOIN core c2 ON p.qid = c2.pid
        WHERE p.pid <> p.qid),
      reach AS (
        SELECT pid AS src, pid AS dst FROM core
        UNION
        SELECT r.src, e.b FROM reach r JOIN ce e ON r.dst = e.a),
      corelabel AS (
        SELECT src AS pid, min(dst) AS cluster FROM reach GROUP BY src),
      borderlabel AS (
        SELECT p.pid, min(cl.cluster) AS cluster
        FROM pairs p
        JOIN corelabel cl ON p.qid = cl.pid
        ANTI JOIN core c ON p.pid = c.pid
        GROUP BY p.pid)
      SELECT pts.pid,
        CASE WHEN cl.pid IS NOT NULL THEN 'core'
             WHEN bl.pid IS NOT NULL THEN 'border'
             ELSE 'noise' END AS role,
        coalesce(cl.cluster, bl.cluster) AS cluster
      FROM pts
      LEFT JOIN corelabel cl ON pts.pid = cl.pid
      LEFT JOIN borderlabel bl ON pts.pid = bl.pid
      ORDER BY pts.pid""",
  )
}
