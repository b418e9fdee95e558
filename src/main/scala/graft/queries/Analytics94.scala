package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 111 (SURVEY.md §2.4):
  *
  *  - q265: Misra–Gries heavy hitters — the bounded-memory path to
  *    "which tokens exceed 1/Phi of a corpus that's too big to GROUP BY
  *    exactly": a k-counter MG sketch (one aggregate, map-side
  *    combinable, ≤ k counters per partition — see
  *    [[graft.functions.MgSketch]]) nominates candidates, and a second
  *    pass joins the ≤ k candidates back for EXACT counts. k > Phi, so
  *    the sketch's N/(k+1) guarantee makes the candidate set a proven
  *    superset of the answer — the final output is exact and
  *    partitioning-independent even though sketch internals aren't.
  *  - q266: count–min sketch with full oracle parity — the classic
  *    d×w counter matrix (d=4 rows from the Kirsch–Mitzenmacher md5
  *    double-hash family, w=512 buckets) built in ONE scan via
  *    posexplode, probed for the exact top-10 tokens: estimate =
  *    min over rows of the hashed bucket's count. Every estimate
  *    provably ≥ the true count (collisions only ADD); DuckDB replays
  *    the identical md5 bucket math bit-for-bit.
  */
object Analytics94 {
  import Tables.t

  /** MG counter budget; must exceed HhPhi for the superset guarantee. */
  private val HhK = 1000

  /** Heavy-hitter threshold: report tokens with freq > N/HhPhi. */
  private val HhPhi = 500

  /** Count–min geometry: CmD hash rows × CmW buckets. */
  private val CmD = 4
  private val CmW = 512

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q265_heavy_hitters" -> ((spark, dir) => {
      // Two deliberate scans of the token stream — sketch then verify —
      // rather than a checkpoint of a corpus-sized frame: at 100 TB the
      // rescan is the cheap part; materializing the tokens is not.
      val toks = tokens(spark, dir)
      val cand = toks
        .agg(graft.functions.MgSketch.candidates(col("tok"), HhK).as("cs"))
        .select(explode(col("cs")).as("tok")) // ≤ HhK rows
      val total = toks.agg(count(lit(1)).as("n_tokens"))
      toks.join(broadcast(cand), "tok")
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .crossJoin(broadcast(total))
        // freq > N/Phi, kept in exact integers (no float division).
        .filter(col("freq") * HhPhi > col("n_tokens"))
        .select(col("tok"), col("freq"), col("n_tokens"),
          round(col("freq").cast("double")
            / col("n_tokens").cast("double"), 6).as("share"))
        .orderBy("tok")
    }),

    "q266_countmin" -> ((spark, dir) => {
      val toks = tokens(spark, dir)
        .select(col("tok"),
          array(TextOps.mdHashes(col("tok")).take(CmD)
            .map(h => h % CmW): _*).as("bk"))
      // One scan, one (seed, bucket)-keyed shuffle builds all d rows of
      // the matrix; the result is d·w counters — broadcastable forever.
      val cm = toks
        .select(posexplode(col("bk")).as(Seq("seed", "bucket")))
        .groupBy("seed", "bucket").agg(count(lit(1)).as("c"))
      // Probe set: the exact top-10 tokens (freq desc, token asc) via
      // the bounded min-k aggregate — no global sort.
      val probes = toks
        .groupBy("tok").agg(count(lit(1)).as("freq"), first(col("bk")).as("bk"))
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("freq")).as("nf"), col("tok").as("t"),
            col("bk").as("bk")), 10).as("w"))
        .select(explode(col("w")).as("p"))
        .select(col("p")("t").as("tok"), (-col("p")("nf")).as("freq"),
          posexplode(col("p")("bk")).as(Seq("seed", "bucket")))
      probes
        .join(broadcast(cm), Seq("seed", "bucket"))
        .groupBy("tok", "freq").agg(min(col("c")).as("cm_est"))
        .select(col("tok"), col("freq"), col("cm_est"),
          (col("cm_est") - col("freq")).as("overshoot"))
        .orderBy("tok")
    }),
  )

  /** DuckDB replica of the Kirsch–Mitzenmacher bucket for hash row `d`
    * (0-based) over SQL string expression `e`: (h1 + (d+1)·h2) mod p
    * mod w, with h1/h2 the two 60-bit md5 halves mod p.
    */
  private def duckBucket(e: String, d: Int): String = {
    val packed = Tables.duckMd5Pack(e)
    s"""(((($packed) // 2147483648 + ${d + 1} * (($packed) % 2147483648))
       |   % 2147483647) % $CmW)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q265_heavy_hitters" -> s"""
      WITH tk AS (
        SELECT tok FROM (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE text IS NOT NULL)
        WHERE length(tok) > 0),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM tk)
      SELECT tok, CAST(count(*) AS BIGINT) AS freq,
        (SELECT n_tokens FROM n) AS n_tokens,
        round(CAST(count(*) AS DOUBLE)
          / (SELECT CAST(n_tokens AS DOUBLE) FROM n), 6) AS share
      FROM tk GROUP BY tok
      HAVING CAST(count(*) AS BIGINT) * $HhPhi > (SELECT n_tokens FROM n)
      ORDER BY tok""",

    "q266_countmin" -> {
      val bucketRows = (0 until CmD).map { d =>
        s"SELECT $d AS seed, ${duckBucket("tok", d)} AS bucket, tok FROM tk"
      }.mkString("\nUNION ALL\n")
      s"""
      WITH tk AS (
        SELECT tok FROM (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE text IS NOT NULL)
        WHERE length(tok) > 0),
      hashed AS ($bucketRows),
      cm AS (
        SELECT seed, bucket, CAST(count(*) AS BIGINT) AS c
        FROM hashed GROUP BY seed, bucket),
      probes AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS freq
        FROM tk GROUP BY tok
        ORDER BY freq DESC, tok LIMIT 10),
      pb AS (
        SELECT DISTINCT p.tok, p.freq, h.seed, h.bucket
        FROM probes p JOIN hashed h USING (tok))
      SELECT pb.tok, pb.freq, min(cm.c) AS cm_est,
        min(cm.c) - pb.freq AS overshoot
      FROM pb JOIN cm USING (seed, bucket)
      GROUP BY pb.tok, pb.freq
      ORDER BY pb.tok"""
    },
  )
}
