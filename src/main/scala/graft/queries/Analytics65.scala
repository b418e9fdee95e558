package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 72 (SURVEY.md §2.4):
  *
  *  - q221: INCREMENTAL SCD2 maintenance — the nightly-merge path a
  *    warehouse actually runs, proven equivalent to the full rebuild
  *    by construction of the check: the engine builds yesterday's
  *    dimension (all snapshots BEFORE the latest day), then applies
  *    the latest day's snapshots as a delta — closing changed open
  *    versions at D−1, appending new versions at D, passing unchanged
  *    customers through untouched — while the ORACLE rebuilds the
  *    whole dimension from scratch (it is literally q203's SQL). A
  *    hash match is the theorem: incremental merge ≡ full rebuild.
  *    Shape: the delta day is a one-row broadcast; the merge is one
  *    co-partitioned left join between the open slice and the delta.
  */
object Analytics65 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_scd2_incremental" -> ((spark, dir) => {
      val snap = Analytics55.prioritySnapshots(spark, dir)
      val dRef = snap.agg(max(col("valid_from")).as("d"))
      val snapB = snap.crossJoin(broadcast(dRef))
        .filter(col("valid_from") < col("d"))
        .select("o_custkey", "valid_from", "prio")
      val delta = snap.crossJoin(broadcast(dRef))
        .filter(col("valid_from") === col("d"))
        .select(col("o_custkey").as("d_custkey"),
          col("valid_from").as("d_day"), col("prio").as("d_prio"))
      val dimBefore = Analytics55.scd2FromSnap(snapB)
      val closed = dimBefore.filter(col("valid_to").isNotNull)
      val open = dimBefore.filter(col("valid_to").isNull)
      val merged = open.join(delta, col("o_custkey") === col("d_custkey"),
        "full_outer")
      // open version survives untouched unless the delta day changes
      // the priority; changed opens close at D-1; new/changed custs
      // get a fresh open version at D
      val keptOpen = merged.filter(col("d_custkey").isNull
          || (col("o_custkey").isNotNull && col("prio") === col("d_prio")))
        .select(col("o_custkey"), col("prio"), col("valid_from"),
          lit(null).cast("date").as("valid_to"))
      val closedNow = merged.filter(col("o_custkey").isNotNull
          && col("d_custkey").isNotNull && col("prio") =!= col("d_prio"))
        .select(col("o_custkey"), col("prio"), col("valid_from"),
          date_sub(col("d_day"), 1).as("valid_to"))
      val opened = merged.filter(col("d_custkey").isNotNull
          && (col("o_custkey").isNull || col("prio") =!= col("d_prio")))
        .select(col("d_custkey").as("o_custkey"),
          col("d_prio").as("prio"), col("d_day").as("valid_from"),
          lit(null).cast("date").as("valid_to"))
      closed.select("o_custkey", "prio", "valid_from", "valid_to")
        .unionByName(keptOpen)
        .unionByName(closedNow)
        .unionByName(opened)
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("o_custkey", "valid_from")
    }),
  )

  /** The oracle is the FULL REBUILD — matching it proves the
    * incremental merge equivalent.
    */
  val oracleSql: Map[String, String] = Map(
    "q221_scd2_incremental" -> Analytics55.oracleSql("q203_scd2_priority"),
  )
}
