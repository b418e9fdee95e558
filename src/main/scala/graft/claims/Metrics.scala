package graft.claims

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Audit metrics (reference claim_pipeline.py:159-170, 186-212) computed as a
  * single aggregation pass, attached via `Dataset.observe` so the candidate
  * write and the metrics share one scan of the input.
  */
final case class PipelineMetrics(
    totalProcessed: Long,
    bySource: Map[String, Long],
    flaggedForResubmission: Long,
    excludedByReason: Map[String, Long],
) {

  /** Render the fixed text template of the reference metrics sink
    * (claim_pipeline.py:223-231), including the Python-dict-repr of
    * `by_source` (SURVEY §2.3 S14).
    */
  def render: String = {
    val bySourceRepr =
      s"{'alpha': ${bySource.getOrElse("alpha", 0L)}, 'beta': ${bySource.getOrElse("beta", 0L)}}"
    val sb = new StringBuilder
    sb ++= "===== Pipeline Metrics Summary =====\n"
    sb ++= s"Total processed: $totalProcessed\n"
    sb ++= s"By source: $bySourceRepr\n"
    sb ++= s"Flagged for resubmission: $flaggedForResubmission\n"
    sb ++= "Excluded by reason:\n"
    PipelineMetrics.BucketOrder.foreach { reason =>
      sb ++= s"  - $reason: ${excludedByReason.getOrElse(reason, 0L)}\n"
    }
    sb.result()
  }
}

object PipelineMetrics {
  /** Bucket iteration order of the reference's dict (claim_pipeline.py:163-169). */
  val BucketOrder: Seq[String] = Seq(
    "not_denied_status", "patient_id_missing", "too_recent",
    "non-retryable_or_ambiguous", "malformed")

  /** Aggregate expressions over the derived claims frame. `corrupt` rows map
    * the reference's error-isolation paths (SURVEY §2.1 O20/O21): they count
    * as malformed, not as processed.
    */
  def aggExprs(eligible: Column, exclusion: Column, source: Column,
      corrupt: Column): Seq[Column] = {
    val ok = !corrupt
    Seq(
      count_if(ok).as("total_processed"),
      count_if(ok && source === "alpha").as("src_alpha"),
      count_if(ok && source === "beta").as("src_beta"),
      count_if(ok && eligible).as("flagged"),
      count_if(ok && exclusion === "not_denied_status").as("not_denied_status"),
      count_if(ok && exclusion === "patient_id_missing").as("patient_id_missing"),
      count_if(ok && exclusion === "too_recent").as("too_recent"),
      count_if(ok && exclusion === "non-retryable_or_ambiguous").as("non_retryable"),
      count_if(corrupt).as("malformed_records"),
    )
  }

  /** Build metrics from the observed metric map produced by [[aggExprs]].
    *
    * @param fileMalformed file-level failure count (unreadable file → +1,
    *                      reference claim_pipeline.py:213-215)
    * @param bugCompat reproduce the reference's live counter-key bug
    *                  (SURVEY §2.3 S9): the increment sites for not-denied,
    *                  patient-missing and non-retryable use wrong dict keys,
    *                  the KeyError is swallowed per record, and those
    *                  exclusions all land in `malformed`; only `too_recent`
    *                  ever counts in its own bucket.
    */
  def fromObserved(m: Map[String, Any], fileMalformed: Long,
      bugCompat: Boolean): PipelineMetrics = {
    def l(k: String) = m.get(k).map(_.asInstanceOf[Long]).getOrElse(0L)
    val malformed = l("malformed_records") + fileMalformed
    val excluded =
      if (bugCompat) Map(
        "not_denied_status" -> 0L,
        "patient_id_missing" -> 0L,
        "too_recent" -> l("too_recent"),
        "non-retryable_or_ambiguous" -> 0L,
        "malformed" -> (malformed + l("not_denied_status") +
          l("patient_id_missing") + l("non_retryable")),
      )
      else Map(
        "not_denied_status" -> l("not_denied_status"),
        "patient_id_missing" -> l("patient_id_missing"),
        "too_recent" -> l("too_recent"),
        "non-retryable_or_ambiguous" -> l("non_retryable"),
        "malformed" -> malformed,
      )
    PipelineMetrics(
      totalProcessed = l("total_processed"),
      bySource = Map("alpha" -> l("src_alpha"), "beta" -> l("src_beta")),
      flaggedForResubmission = l("flagged"),
      excludedByReason = excluded,
    )
  }
}
