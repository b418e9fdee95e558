package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 101 — spectral structure (SURVEY.md §2.4):
  *
  *  - s29: top principal component via power iteration — the PCA step
  *    every embedding-quality audit starts with. One distributed pass
  *    computes the exact moment matrix over the first 8 dimensions
  *    (components rounded to 8 decimals → DECIMAL(12,8), so every sum
  *    and cross-product is order-free and bit-identical in both
  *    engines); the 8×8 covariance then drives 6 unrolled power-method
  *    iterations v ← normalize(C·v) expressed as plain scalar columns
  *    on the one-row aggregate frame — every matvec and norm is a
  *    left-associated chain rendered identically to both engines, so
  *    the doubles replay bit-for-bit. Output: Rayleigh-quotient
  *    eigenvalue, explained-variance share (λ / trace C), and the
  *    sign-fixed component vector. Scale shape: the only data-sized
  *    work is the single moment aggregation (map-side combinable);
  *    everything after is O(d²) on one row.
  */
object TextOps53 {
  import Tables.t

  private val D = 8
  private val T = 6

  /** 1/log2(rank+1) discount weights for NDCG@10 — rendered once as
    * DECIMAL(12,9) literals to both engines, so the per-probe DCG is an
    * order-free exact DECIMAL sum (a double fold would be
    * aggregation-order-sensitive).
    */
  private val DcgW: Seq[BigDecimal] = (1 to 10).map(i =>
    BigDecimal(1.0 / (math.log(i + 1) / math.log(2)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP))

  /** Ideal-DCG prefix sums of [[DcgW]] (exact sums of the rounded
    * weights — identical literals on both sides).
    */
  private val IdcgW: Seq[BigDecimal] =
    DcgW.scanLeft(BigDecimal(0))(_ + _).tail

  private def decLits(xs: Seq[BigDecimal]): String =
    xs.map(x => s"CAST($x AS DECIMAL(12,9))").mkString(", ")

  /** c-name helper over the upper-triangle storage. */
  private def cn(i: Int, j: Int): String =
    if (i <= j) s"c_${i}_$j" else s"c_${j}_$i"

  /** Left-associated matvec row i against vector columns `v<t>_j`. */
  private def matvec(i: Int, vPrefix: String): String =
    matvecWith(i, vPrefix, cn)

  /** Matvec against an arbitrary upper-triangle matrix naming. */
  private def matvecWith(i: Int, vPrefix: String,
      c: (Int, Int) => String): String =
    (0 until D).map(j => s"${c(i, j)} * ${vPrefix}_$j").mkString(" + ")

  /** Deflated-matrix accessor (s31). */
  private def en(i: Int, j: Int): String =
    if (i <= j) s"e_${i}_$j" else s"e_${j}_$i"

  /** T unrolled DuckDB power-iteration CTEs over matrix `cNm`, vector
    * columns `<vp><t>_<i>`, starting at CTE `start` (which must expose
    * `<vp>0_<i>`).
    */
  /** @param orthoTo when set (e.g. Some("u6")), each iteration
    *                 Gram–Schmidt-projects that vector back out of the
    *                 matvec result BEFORE normalizing — without this,
    *                 deflation alone leaves a first-component residue
    *                 whenever the spectrum is flat (measured −0.086 on
    *                 the near-isotropic synthetic embeddings).
    */
  private def duckChain(cNm: (Int, Int) => String, vp: String,
      start: String, orthoTo: Option[String] = None): String =
    (1 to T).map { tt =>
      val prev = if (tt == 1) start else s"${vp}t${tt - 1}"
      val ws = (0 until D)
        .map(i => s"${matvecWith(i, s"$vp${tt - 1}", cNm)} AS ${vp}w${tt}_$i")
        .mkString(",\n    ")
      val base = orthoTo match {
        case None => s"(SELECT * FROM ${vp}tw$tt)"
        case Some(u) =>
          val dot = (0 until D).map(i => s"${u}_$i * ${vp}w${tt}_$i")
            .mkString(" + ")
          s"""(SELECT *, ${(0 until D)
               .map(i => s"${vp}w${tt}_$i - ${vp}d$tt * ${u}_$i" +
                 s" AS ${vp}o${tt}_$i").mkString(", ")}
             |   FROM (SELECT *, $dot AS ${vp}d$tt FROM ${vp}tw$tt))"""
            .stripMargin
      }
      val wc = (i: Int) =>
        if (orthoTo.isDefined) s"${vp}o${tt}_$i" else s"${vp}w${tt}_$i"
      val nrm = "sqrt(" + (0 until D)
        .map(i => s"${wc(i)} * ${wc(i)}").mkString(" + ") + ")"
      s"""${vp}tw$tt AS (SELECT *,
         |    $ws
         |  FROM $prev),
         |${vp}t$tt AS (SELECT *,
         |    ${(0 until D)
              .map(i => s"${wc(i)} / ${vp}nrm$tt AS $vp${tt}_$i")
              .mkString(", ")}
         |  FROM (SELECT *, $nrm AS ${vp}nrm$tt FROM $base))"""
        .stripMargin
    }.mkString(",\n")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s29_pca_power" -> ((spark, dir) => {
      def xi(i: Int): String =
        s"CAST(round(CAST(embedding[$i] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as("n")) ++
          (0 until D).map(i => sum(expr(xi(i))).as(s"s_$i")) ++
          (for (i <- 0 until D; j <- i until D)
            yield sum(expr(s"${xi(i)} * ${xi(j)}")).as(s"p_${i}_$j"))
      var fr = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .agg(aggs.head, aggs.tail: _*)
      for (i <- 0 until D; j <- i until D)
        fr = fr.withColumn(s"c_${i}_$j", expr(
          s"""(CAST(p_${i}_$j AS DOUBLE)
             | - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE)
             |   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)""".stripMargin))
      for (i <- 0 until D)
        fr = fr.withColumn(s"v0_$i", expr("1.0 / sqrt(8.0)"))
      for (tt <- 1 to T) {
        for (i <- 0 until D)
          fr = fr.withColumn(s"w${tt}_$i", expr(matvec(i, s"v${tt - 1}")))
        fr = fr.withColumn(s"nrm$tt", expr("sqrt(" +
          (0 until D).map(i => s"w${tt}_$i * w${tt}_$i").mkString(" + ")
          + ")"))
        for (i <- 0 until D)
          fr = fr.withColumn(s"v${tt}_$i",
            expr(s"w${tt}_$i / nrm$tt"))
      }
      for (i <- 0 until D)
        fr = fr.withColumn(s"r_$i", expr(matvec(i, s"v$T")))
      val rayleigh =
        (0 until D).map(i => s"v${T}_$i * r_$i").mkString(" + ")
      val trace = (0 until D).map(i => s"c_${i}_$i").mkString(" + ")
      fr.select(
        Seq(col("n").as("n_vectors"),
          round(expr(rayleigh), 6).as("lambda1"),
          round(expr(s"($rayleigh) / ($trace)"), 6).as("explained_share")) ++
          (0 until D).map(i => round(expr(
            s"CASE WHEN v${T}_0 < 0 THEN -v${T}_$i ELSE v${T}_$i END"), 6)
            .as(s"v_$i")): _*)
    }),

    // Second principal component via deflation — s29's power iteration
    // on C' = C − λ1·v1·v1ᵀ (Hotelling deflation). The ONLY data-sized
    // work is the one exact-moment aggregation; the covariance is an
    // 8×8 constant, so both power chains now run as plain driver
    // doubles over the collected one-row frame — the MLlib posture
    // (distributed Gramian, driver eigensolve). The former expression-
    // chain formulation spent ~26 eager-checkpoint jobs on a ONE-ROW
    // frame (measured 3.85 s at sf0.1, >80% scheduling). Every driver
    // operation mirrors the old rendered expression left-to-right
    // (left-associated sums, same divides, scala BigDecimal round —
    // the same call catalyst's Round makes for DoubleType), so the
    // doubles replay bit-for-bit; the oracle gate pins it. Output: λ2,
    // its variance share, the v1·v2 orthogonality witness (≈0 by
    // construction), and the sign-fixed second component.
    "s31_pca_two" -> ((spark, dir) => {
      def xi(i: Int): String =
        s"CAST(round(CAST(embedding[$i] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as("n")) ++
          (0 until D).map(i => sum(expr(xi(i))).as(s"s_$i")) ++
          (for (i <- 0 until D; j <- i until D)
            yield sum(expr(s"${xi(i)} * ${xi(j)}")).as(s"p_${i}_$j"))
      val mrow = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .agg(aggs.head, aggs.tail: _*)
        .head() // one row: 1 + 8 + 36 scalars, constant at any scale
      val n = mrow.getLong(0)
      require(n > 0, "s31: no embeddings")
      val nd = n.toDouble
      val s = Array.tabulate(D)(i => mrow.getDecimal(1 + i).doubleValue)
      val cM = Array.ofDim[Double](D, D)
      var idx = 1 + D
      for (i <- 0 until D; j <- i until D) {
        val pd = mrow.getDecimal(idx).doubleValue
        idx += 1
        val c = (pd - s(i) * s(j) / nd) / nd
        cM(i)(j) = c; cM(j)(i) = c
      }
      def matvecD(m: Array[Array[Double]], v: Array[Double])
          : Array[Double] =
        Array.tabulate(D) { i =>
          var acc = m(i)(0) * v(0)
          for (j <- 1 until D) acc += m(i)(j) * v(j)
          acc
        }
      def dotD(a: Array[Double], b: Array[Double]): Double = {
        var acc = a(0) * b(0)
        for (i <- 1 until D) acc += a(i) * b(i)
        acc
      }
      def chainD(m: Array[Array[Double]],
          orthoTo: Option[Array[Double]]): Array[Double] = {
        var v = Array.fill(D)(1.0 / math.sqrt(8.0))
        for (_ <- 1 to T) {
          val w = matvecD(m, v)
          val wc = orthoTo match {
            case None => w
            case Some(u) =>
              val d = dotD(u, w)
              Array.tabulate(D)(i => w(i) - d * u(i))
          }
          val nrm = math.sqrt(dotD(wc, wc))
          v = wc.map(_ / nrm)
        }
        v
      }
      val u = chainD(cM, None)
      val lam1 = dotD(u, matvecD(cM, u))
      // upper-triangle value mirrored BOTH ways, like the en() accessor
      // ((lam1*u_i)*u_j and (lam1*u_j)*u_i can differ in the last ulp)
      val eM = Array.ofDim[Double](D, D)
      for (i <- 0 until D; j <- i until D) {
        val e = cM(i)(j) - lam1 * u(i) * u(j)
        eM(i)(j) = e; eM(j)(i) = e
      }
      val z = chainD(eM, Some(u))
      val lam2 = dotD(z, matvecD(eM, z))
      val ortho = dotD(u, z)
      var trace = cM(0)(0)
      for (i <- 1 until D) trace += cM(i)(i)
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val v2 = Array.tabulate(D)(i => r6(if (z(0) < 0) -z(i) else z(i)))
      import spark.implicits._
      Seq((n, r6(lam1), r6(lam2), r6(lam2 / trace), r6(ortho),
          v2(0), v2(1), v2(2), v2(3), v2(4), v2(5), v2(6), v2(7)))
        .toDF(Seq("n_vectors", "lambda1", "lambda2", "share2", "ortho") ++
          (0 until D).map(i => s"v2_$i"): _*)
    }),

    // NDCG@10 retrieval-quality audit — the graded complement of s4's
    // recall: rank the corpus for each probe by exact cosine (the s7
    // machinery: one map-only scan past the broadcast probes, bounded
    // min-k, n_id tie-break), score binary relevance (neighbor label =
    // probe label) under the 1/log2(rank+1) discount, and normalize by
    // the ideal DCG for min(10, total relevant in corpus). Discount
    // weights and their prefix sums are shared DECIMAL literals, so
    // both engines sum identical exact terms in any order.
    "s30_ndcg" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
      val probes = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
          col("label").as("true_label"))
      val neigh = e.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb"), col("label").as("n_label"))
      val top = neigh.crossJoin(broadcast(probes))
        .filter(col("n_id") =!= col("p_id"))
        .select(col("p_id"), col("true_label"),
          round(graft.functions.VectorOps.cosine(col("n_emb"),
            col("p_emb")), 6).as("cos"),
          col("n_id"), col("n_label"))
        .groupBy("p_id", "true_label")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("cos")).as("neg"), col("n_id").as("id"),
            col("n_label").as("lbl")), 10).as("top"))
        .select(col("p_id"), col("true_label"),
          posexplode(col("top")))
        .select(col("p_id"), col("true_label"),
          (col("pos") + 1).cast("int").as("rnk"),
          (col("col.lbl") === col("true_label")).as("rel"))
      val agg = top.groupBy("p_id", "true_label")
        .agg(sum(when(col("rel"),
          expr(s"element_at(array(${decLits(DcgW)}), rnk)"))).as("dcg"),
          count_if(col("rel")).as("n_rel_top"))
      val lc = e.groupBy(col("label")).agg(count(lit(1)).as("c"))
      agg.join(broadcast(lc), col("true_label") === col("label"))
        .select(col("p_id").as("vec_id"), col("true_label"),
          col("n_rel_top"), (col("c") - 1).as("n_rel_total"),
          expr(s"""CASE WHEN c - 1 = 0 THEN NULL ELSE
                  |  round(CAST(coalesce(dcg, 0) AS DOUBLE)
                  |    / CAST(element_at(array(${decLits(IdcgW)}),
                  |        CAST(least(10, c - 1) AS INT)) AS DOUBLE), 6)
                  |END""".stripMargin).as("ndcg"))
        .orderBy("vec_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s31_pca_two" -> {
      def xi(i: Int): String =
        s"CAST(round(CAST(embedding[${i + 1}] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val moments =
        (Seq("CAST(count(*) AS BIGINT) AS n") ++
          (0 until D).map(i => s"sum(${xi(i)}) AS s_$i") ++
          (for (i <- 0 until D; j <- i until D)
            yield s"sum(${xi(i)} * ${xi(j)}) AS p_${i}_$j")).mkString(",\n    ")
      val covs = (for (i <- 0 until D; j <- i until D) yield
        s"""(CAST(p_${i}_$j AS DOUBLE)
           | - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE)
           |   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS c_${i}_$j"""
          .stripMargin).mkString(",\n    ")
      val lam2 = (0 until D).map(i => s"z${T}_$i * r2_$i").mkString(" + ")
      val ortho = (0 until D).map(i => s"u${T}_$i * z${T}_$i")
        .mkString(" + ")
      val trace = (0 until D).map(i => s"c_${i}_$i").mkString(" + ")
      s"""WITH m AS (
         |  SELECT
         |    $moments
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |cov AS (SELECT *,
         |    $covs
         |  FROM m),
         |u0 AS (SELECT *, ${(0 until D)
              .map(i => s"1.0 / sqrt(8.0) AS u0_$i").mkString(", ")}
         |  FROM cov),
         |${duckChain(cn, "u", "u0")},
         |ray AS (SELECT *,
         |    ${(0 until D).map(i => s"${matvecWith(i, s"u$T", cn)} AS r_$i")
              .mkString(", ")}
         |  FROM ut$T),
         |lam AS (SELECT *,
         |    ${(0 until D).map(i => s"u${T}_$i * r_$i").mkString(" + ")}
         |      AS lam1
         |  FROM ray),
         |defl AS (SELECT *,
         |    ${(for (i <- 0 until D; j <- i until D) yield
                s"${cn(i, j)} - lam1 * u${T}_$i * u${T}_$j AS e_${i}_$j")
              .mkString(",\n    ")}
         |  FROM lam),
         |z0 AS (SELECT *, ${(0 until D)
              .map(i => s"1.0 / sqrt(8.0) AS z0_$i").mkString(", ")}
         |  FROM defl),
         |${duckChain(en, "z", "z0", orthoTo = Some(s"u$T"))},
         |ray2 AS (SELECT *,
         |    ${(0 until D).map(i => s"${matvecWith(i, s"z$T", en)} AS r2_$i")
              .mkString(", ")}
         |  FROM zt$T)
         |SELECT n AS n_vectors,
         |  round(lam1, 6) AS lambda1,
         |  round($lam2, 6) AS lambda2,
         |  round(($lam2) / ($trace), 6) AS share2,
         |  round($ortho, 6) AS ortho,
         |  ${(0 until D).map(i =>
             s"round(CASE WHEN z${T}_0 < 0 THEN -z${T}_$i ELSE z${T}_$i END, 6) AS v2_$i")
            .mkString(",\n  ")}
         |FROM ray2""".stripMargin
    },

    "s30_ndcg" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT vec_id AS p_id, label AS true_label, emb AS p_emb
         |  FROM e WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT p_id, true_label, e.vec_id AS n_id, e.label AS n_label,
         |    round(list_dot_product(e.emb, p_emb) /
         |      (sqrt(list_dot_product(e.emb, e.emb))
         |        * sqrt(list_dot_product(p_emb, p_emb))), 6) AS cos
         |  FROM e CROSS JOIN p WHERE e.vec_id <> p_id),
         |knn AS (
         |  SELECT p_id, true_label, n_label, rn FROM (
         |    SELECT p_id, true_label, n_label,
         |      row_number() OVER (PARTITION BY p_id
         |        ORDER BY cos DESC, n_id) AS rn
         |    FROM scored) WHERE rn <= 10),
         |agg AS (
         |  SELECT p_id, true_label,
         |    sum(CASE WHEN n_label = true_label THEN
         |      list_value(${decLits(DcgW)})[rn] END) AS dcg,
         |    CAST(count(*) FILTER (n_label = true_label) AS BIGINT)
         |      AS n_rel_top
         |  FROM knn GROUP BY 1, 2),
         |lc AS (SELECT label, count(*) AS c FROM e GROUP BY 1)
         |SELECT p_id AS vec_id, true_label, n_rel_top,
         |  CAST(c - 1 AS BIGINT) AS n_rel_total,
         |  CASE WHEN c - 1 = 0 THEN NULL ELSE
         |    round(CAST(coalesce(dcg, 0) AS DOUBLE)
         |      / CAST(list_value(${decLits(IdcgW)})[least(10, c - 1)]
         |          AS DOUBLE), 6)
         |  END AS ndcg
         |FROM agg JOIN lc ON true_label = label
         |ORDER BY vec_id""".stripMargin,

    "s29_pca_power" -> {
      def xi(i: Int): String =
        s"CAST(round(CAST(embedding[${i + 1}] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val moments =
        (Seq("CAST(count(*) AS BIGINT) AS n") ++
          (0 until D).map(i => s"sum(${xi(i)}) AS s_$i") ++
          (for (i <- 0 until D; j <- i until D)
            yield s"sum(${xi(i)} * ${xi(j)}) AS p_${i}_$j")).mkString(",\n    ")
      val covs = (for (i <- 0 until D; j <- i until D) yield
        s"""(CAST(p_${i}_$j AS DOUBLE)
           | - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE)
           |   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS c_${i}_$j"""
          .stripMargin).mkString(",\n    ")
      val v0 = (0 until D)
        .map(i => s"1.0 / sqrt(8.0) AS v0_$i").mkString(", ")
      val iters = (1 to T).map { tt =>
        val ws = (0 until D)
          .map(i => s"${matvec(i, s"v${tt - 1}")} AS w${tt}_$i")
          .mkString(",\n    ")
        val nrm = "sqrt(" +
          (0 until D).map(i => s"w${tt}_$i * w${tt}_$i").mkString(" + ") + ")"
        s"""w$tt AS (SELECT *,
           |    $ws
           |  FROM ${if (tt == 1) "v0" else s"it${tt - 1}"}),
           |it$tt AS (SELECT *,
           |    ${(0 until D).map(i => s"w${tt}_$i / nrm$tt AS v${tt}_$i")
                .mkString(", ")}
           |  FROM (SELECT *, $nrm AS nrm$tt FROM w$tt))""".stripMargin
      }.mkString(",\n")
      val rayleigh =
        (0 until D).map(i => s"v${T}_$i * r_$i").mkString(" + ")
      val trace = (0 until D).map(i => s"c_${i}_$i").mkString(" + ")
      s"""WITH m AS (
         |  SELECT
         |    $moments
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |cov AS (SELECT *,
         |    $covs
         |  FROM m),
         |v0 AS (SELECT *, $v0 FROM cov),
         |$iters,
         |ray AS (SELECT *,
         |    ${(0 until D).map(i => s"${matvec(i, s"v$T")} AS r_$i")
              .mkString(", ")}
         |  FROM it$T)
         |SELECT n AS n_vectors,
         |  round($rayleigh, 6) AS lambda1,
         |  round(($rayleigh) / ($trace), 6) AS explained_share,
         |  ${(0 until D).map(i =>
             s"round(CASE WHEN v${T}_0 < 0 THEN -v${T}_$i ELSE v${T}_$i END, 6) AS v_$i")
            .mkString(",\n  ")}
         |FROM ray""".stripMargin
    },
  )
}
