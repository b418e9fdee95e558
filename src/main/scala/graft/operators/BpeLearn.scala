package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning — the tokenizer
  * half of an LLM data pipeline (the reference engine has no tokenizer
  * story; `/root/reference/claim_pipeline.py` never touches text
  * statistics).
  *
  * The classic sequential algorithm (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") folds a whole
  * corpus into a word-frequency table, then repeats: count adjacent
  * symbol pairs, merge the most frequent pair everywhere, record it.
  * Re-expressed Spark-first:
  *
  *  - the word table is the ONLY corpus-sized state, and it shrinks to
  *    |vocab| rows after one groupBy — at 100 TB the 10^9-document
  *    corpus folds to a few 10^6 distinct words before any iteration
  *    touches it;
  *  - each round is one map-side-combinable pair-count aggregation plus
  *    ONE collected row (the argmax pair) — the ConnectedComponents
  *    iteration discipline: the driver sees a scalar per round, never a
  *    frame;
  *  - the merge application is a row-local `aggregate` fold over each
  *    word's token array — whole-stage-codegen'd, zero shuffle — and
  *    the lineage is truncated with an eager localCheckpoint per round
  *    so round k's plan doesn't replay rounds 1..k-1.
  *
  * Ties break deterministically: highest count, then lexicographically
  * smallest (left, right) — the property the DuckDB oracle and the
  * sequential reference in BpeLearnSpec both pin.
  */
object BpeLearn {

  /** One merge learned in one round: the pair, and its count when it
    * was chosen.
    */
  final case class Merge(round: Int, left: String, right: String,
      count: Long)

  /** Split a word into single-character tokens (split("") emits no
    * empty strings for non-empty input, but guard anyway).
    */
  def charTokens(w: Column): Column =
    filter(split(w, ""), s => s =!= lit(""))

  /** Greedy left-to-right, non-overlapping merge of every adjacent
    * (a, b) occurrence into the single token a+b — the exact
    * application step of the sequential algorithm, as a row-local fold:
    * the accumulator carries the rebuilt prefix plus one pending token,
    * and a pending `a` followed by `b` flushes as the merged token with
    * the pending slot cleared (so a merged token never immediately
    * re-merges — "aaa" + (a,a) → ["aa","a"]).
    */
  def mergePair(tokens: Column, a: String, b: String): Column = {
    val merged = a + b
    val folded = aggregate(
      tokens,
      struct(array().cast("array<string>").as("acc"),
        lit(null).cast("string").as("pend")),
      (st, x) => {
        val acc = st.getField("acc")
        val pend = st.getField("pend")
        when(pend.isNull, struct(acc.as("acc"), x.as("pend")))
          .when(pend === lit(a) && x === lit(b),
            struct(concat(acc, array(lit(merged))).as("acc"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(acc, array(pend)).as("acc"),
            x.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"),
          array(st.getField("pend")))))
    folded
  }

  /** Frequency-weighted adjacent-pair counts over a (toks, cnt) state
    * frame — one explode plus one map-side-combined aggregation.
    */
  def pairCounts(state: DataFrame): DataFrame = state
    .filter(size(col("toks")) >= 2)
    .select(col("cnt"), explode(expr(
      "transform(sequence(1, size(toks) - 1)," +
        " i -> struct(toks[i - 1] AS l, toks[i] AS r))")).as("p"))
    .select(col("p.l").as("l"), col("p.r").as("r"), col("cnt"))
    .groupBy("l", "r").agg(sum(col("cnt")).as("total"))

  /** Learn `rounds` merges from a (w, cnt) word-frequency frame.
    * Returns the merge list in order plus the final tokenized state
    * (w, cnt, toks).
    */
  def learn(words: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    val merges = ArrayBuffer.empty[Merge]
    var state = words
      .select(col("w"), col("cnt"), charTokens(col("w")).as("toks"))
      .localCheckpoint(true)
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // the round's single driver-side scalar: the argmax pair
      val top = pairCounts(state)
        .orderBy(col("total").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, l, rt, n)
        state = state
          .withColumn("toks", mergePair(col("toks"), l, rt))
          .localCheckpoint(true)
        r += 1
      }
    }
    (merges.toSeq, state)
  }
}
