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
    */
  def l2sq(a: Column, b: Column): Column =
    VectorOps.dot(a, a) - lit(2.0) * VectorOps.dot(a, b) + VectorOps.dot(b, b)

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
      val subCol = slice(col(embCol), mi * sub + 1, sub)
      val scored = array(cb.zipWithIndex.map { case (cw, ki) =>
        struct((VectorOps.dot(cwSub(cw, mi), cwSub(cw, mi)) -
          lit(2.0) * VectorOps.dot(subCol, cwSub(cw, mi))).as("d"),
          lit(ki).as("k"))
      }: _*)
      val bestK = element_at(array_sort(scored), 1).getField("k")
      val table = array(cb.map(cw => cwSub(cw, mi)): _*)
      element_at(table, bestK + 1)
    }: _*)
    vecs.withColumn("recon", recon)
  }
}
