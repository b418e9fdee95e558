package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via prefix filtering (the PPJoin family,
  * Chaudhuri/Ganti/Kaushik 2006, Xiao et al. 2008): all id pairs whose
  * set Jaccard ≥ τ, WITHOUT an all-pairs compare and WITHOUT the recall
  * loss of LSH.
  *
  * Theorem behind the prune: order every set by ascending global token
  * frequency (rarest first, token string as tie-break). If
  * |x ∩ y| / |x ∪ y| ≥ τ, then x and y must share a token among each
  * side's first |x| − ⌈τ·|x|⌉ + 1 entries — so equi-joining only those
  * PREFIX tokens yields a candidate superset, verified exactly
  * afterwards. Completeness is pinned against brute force in
  * PrefixSimilarityJoinSpec.
  *
  * Scale shape: document frequency and per-set ranking are token-keyed
  * shuffles (map-side combinable df, one window partitioning);
  * candidate expansion runs through the capped [[BucketedPairs]] walk
  * (never a self-join); verification re-reads ONLY candidate sets via a
  * left_semi join, so the exact-Jaccard step is O(candidates), not
  * O(corpus). The candidate frame is persisted and eagerly counted once
  * — without it AQE races the a/b verify branches into materializing
  * the pair pipeline twice.
  */
object PrefixSimilarityJoin {

  /** (a_id, b_id, jaccard) for every unordered pair with Jaccard ≥ tau.
    *
    * @param sets      frame carrying `idCol` and an array column `setCol`
    *                  (elements compared by equality; arrays should be
    *                  distinct-element sets)
    * @param tau       Jaccard threshold in (0, 1]
    * @param maxBucket skew guard: prefix tokens shared by more than this
    *                  many sets are dropped whole (degenerate stopword
    *                  buckets would otherwise expand quadratically)
    */
  def pairs(sets: DataFrame, idCol: String, setCol: String, tau: Double,
      maxBucket: Int = 1000): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    // Set size rides the pre-explode row (size() of the array) instead
    // of a third window over the exploded frame. Tokens hash to 62-bit
    // Md5Pack keys MAP-SIDE (the d61/d63 device): every downstream
    // exchange — the df window, the rank tie-break, the bucket walk —
    // ships 8 bytes per token instead of the raw shingle string. Any
    // consistent global token order satisfies the prefix theorem, and
    // the final exact-Jaccard verification makes the OUTPUT invariant
    // to which order was used, so hashed order ≡ string order for the
    // result. Caveat: a 2^-62 collision merging two distinct tokens
    // coarsens their bucket, and if the MERGED bucket exceeds
    // maxBucket the walk drops it WHOLE — a false negative the exact
    // verify cannot recover. At ~2^-62 per token pair this is
    // negligible against any hardware fault rate; strict equivalence
    // with string-token order would need salt-rehashing oversized
    // buckets instead of hashing per-token.
    val tok = sets.select(col(idCol).as("_id"), size(col(setCol)).as("_sz"),
      explode(col(setCol)).as("_tok"))
      .select(col("_id"), col("_sz"),
        graft.functions.Md5Pack(col("_tok")).as("_th"))
    // Document frequency as a count over the token partition instead of
    // a groupBy + join-back: the join formulation executed the exploded
    // lineage TWICE (once into the aggregation, once into the join) and
    // paid a third shuffle for the join itself — measured ~40% of d11's
    // time at sf0.1. This shape runs the explode once and exactly two
    // exchanges: token (df) then id (rank/size).
    val wDf = Window.partitionBy("_th")
    val wRank = Window.partitionBy("_id").orderBy(col("_df"), col("_th"))
    val prefix = tok
      .withColumn("_df", count(lit(1)).over(wDf))
      .withColumn("_pos", row_number().over(wRank))
      .filter(col("_pos") <= col("_sz") - ceil(col("_sz") * tau) + 1)
      .select("_id", "_th", "_sz")
    // Length filter (PPJoin): J(a,b) ≥ τ forces min(|a|,|b|) ≥ τ·max —
    // carrying sizes through the bucket walk prunes size-incompatible
    // candidates BEFORE the array-intersect verify pays for them
    // (measured: drops ~40% of d11's candidate pairs at sf0.1).
    val cand = BucketedPairs
      .pairs(prefix, Seq("_th"),
        struct(col("_id").as("i"), col("_sz").as("s")), maxBucket)
      .filter(least(col("x")("s"), col("y")("s"))
        >= lit(tau) * greatest(col("x")("s"), col("y")("s")))
      .select(col("x")("i").as("a_id"), col("y")("i").as("b_id"))
      .distinct()
      .persist()
    cand.count()
    val candIds = cand.select(col("a_id").as(idCol))
      .union(cand.select(col("b_id").as(idCol))).distinct()
    // Candidate sets are re-derived (and re-shingled) by BOTH verify
    // join branches without the persist; the frame is candidate-bounded.
    // The verify intersects 8-byte Md5Pack element hashes, not the raw
    // token strings: string array_intersect + array_union hashed every
    // UTF8String element per candidate pair and was measured at ~12s of
    // d11's task time at sf0.1 vs ~1.5s for the long-array form. The
    // union size is derived from the (distinct-element, per the API
    // contract) set sizes as |a|+|b|-|a∩b| instead of materializing the
    // union array. Same collision caveat as the prefix keys above: a
    // 2^-62 element-hash collision could perturb one pair's jaccard;
    // strict string equivalence would re-verify hashed-equal pairs on
    // the raw tokens.
    val candSets = sets.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), size(col(setCol)).as("_n"),
        graft.functions.Md5PackArr(col(setCol)).as("_hs"))
      .persist()
    val inter: Column = size(array_intersect(col("_a"), col("_b")))
    cand
      .join(candSets.select(col(idCol).as("a_id"), col("_hs").as("_a"),
        col("_n").as("_na")), "a_id")
      .join(candSets.select(col(idCol).as("b_id"), col("_hs").as("_b"),
        col("_n").as("_nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (inter / (col("_na") + col("_nb") - inter)).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
