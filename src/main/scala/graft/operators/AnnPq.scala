package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Product-quantization ANN (Jégou et al., PAMI 2011) — the
  * memory-compressed family next to [[AnnLsh]] (hyperplane buckets) and
  * [[AnnIvf]] (inverted lists): vectors quantize to M sub-codes (one
  * codeword id per subspace), queries score candidates against the
  * RECONSTRUCTED vector (asymmetric distance computation), so the
  * index stores M bytes per vector instead of D floats.
  *
  * The codebook is a deterministic md5-ordered sample (the AnnIvf
  * seeding device), one shared sample whose m-th slice is subspace m's
  * codeword table — so the whole pipeline replays in DuckDB SQL.
  *
  * Scale shape: encoding is a PURE MAP over literal codeword arrays
  * (the codebook is K·D doubles — constant size, in the task closure);
  * no shuffle, no join, no window anywhere in the build. Encode scores
  * use the expansion argmin_k ‖v−c‖² = argmin_k (c·c − 2 v·c) — one
  * data-dependent dot per codeword; c·c constant-folds at plan time.
  */
object AnnPq {

  /** Exact squared L2 via the dot identity — the SAME association the
    * oracle writes (`(a·a − 2 a·b) + b·b`), so doubles agree bit-for-bit.
    * One codegen'd pass ([[graft.functions.L2Sq]]) instead of three
    * interpreted HOF dots — the probe×candidate scoring loop is the other
    * half of s5's cost beside the encode.
    */
  def l2sq(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.l2Sq(a, b)

  /** K codebook vectors: the md5-ordered deterministic sample (id as
    * tiebreak), collected once — constant size at any corpus scale.
    */
  def codebook(vecs: DataFrame, idCol: String, embCol: String,
      k: Int): Array[Array[Double]] =
    vecs.select(col(embCol),
        graft.functions.Md5Pack(col(idCol).cast("string")).as("_h"),
        col(idCol))
      .orderBy(col("_h"), col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](0).toArray)

  /** Chosen codeword index for subspace `mi` — the shared encode argmin:
    * argmin_k (c·c − 2 v·c), ties toward the lower codeword index in
    * both engines (struct min on (distance, k)).
    *
    * The codeword side is a plan-time literal, so both dots UNROLL to
    * codegen'd primitives instead of interpreted zip_with/aggregate
    * HOFs: c·c folds to a Scala constant and v·c to an element_at
    * product chain — both seeded with 0.0 and accumulated left-to-right,
    * the exact fold `VectorOps.dot` (and DuckDB's list_dot_product)
    * performs, so the doubles are bit-identical to the HOF formulation.
    * Measured at sf0.1: the unrolled argmin + array_min cut s5 from
    * 9.4s to 6.2s (the rest is the probe-scoring pass — see [[l2sq]]).
    */
  private def bestK(embCol: String, cb: Array[Array[Double]],
      sub: Int, mi: Int): Column = {
    val subCol = slice(col(embCol), mi * sub + 1, sub)
    val scored = array(cb.zipWithIndex.map { case (cw, ki) =>
      val cwS = cw.slice(mi * sub, (mi + 1) * sub)
      val cc = cwS.foldLeft(0.0)((acc, x) => acc + x * x)
      val vc = cwS.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (c, i)) =>
        acc + element_at(subCol, i + 1) * lit(c)
      }
      struct((lit(cc) - lit(2.0) * vc).as("d"), lit(ki).as("k"))
    }: _*)
    array_min(scored).getField("k")
  }

  /** Adds `recon` — the PQ reconstruction (chosen codeword slice per
    * subspace, concatenated) — as one map-only expression. Encode ties
    * break toward the lower codeword index in both engines.
    *
    * @param m number of subspaces; must divide the dimension
    */
  def withReconstruction(vecs: DataFrame, embCol: String,
      cb: Array[Array[Double]], m: Int): DataFrame = {
    require(cb.nonEmpty, "empty codebook")
    val d = cb(0).length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val sub = d / m
    def cwSub(cw: Array[Double], mi: Int): Column =
      array(cw.slice(mi * sub, (mi + 1) * sub).map(lit(_)): _*)
    val recon = concat((0 until m).map { mi =>
      val table = array(cb.map(cw => cwSub(cw, mi)): _*)
      element_at(table, bestK(embCol, cb, sub, mi) + 1)
    }: _*)
    vecs.withColumn("recon", recon)
  }

  /** Adds `codes` — the M chosen codeword indices (array<int>) — the
    * compressed representation itself, for code-equality blocking
    * (SemDeDup-style semantic dedup groups on it). Same map-only encode
    * as [[withReconstruction]].
    */
  def withCodes(vecs: DataFrame, embCol: String,
      cb: Array[Array[Double]], m: Int): DataFrame = {
    require(cb.nonEmpty, "empty codebook")
    val d = cb(0).length
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val sub = d / m
    vecs.withColumn("codes",
      array((0 until m).map(mi => bestK(embCol, cb, sub, mi)): _*))
  }
}
