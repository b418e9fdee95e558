package graft.claims

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset` views over the pipeline (SURVEY.md §1.1: case-class
  * encoders where compile-time field checks help; the DataFrame API remains
  * the dynamic-schema workhorse underneath).
  */
object TypedApi {

  /** Normalized claims from an alpha CSV as a typed Dataset. */
  def readAlphaTyped(spark: SparkSession, path: String): Dataset[Claim] = {
    import spark.implicits._
    Normalize.readAlpha(spark, path).as[Claim]
  }

  /** Normalized claims from a beta JSON file as a typed Dataset. */
  def readBetaTyped(spark: SparkSession, path: String): Dataset[Claim] = {
    import spark.implicits._
    Normalize.readBeta(spark, path).as[Claim]
  }

  /** Eligible resubmission candidates as a typed Dataset. */
  def candidatesTyped(claims: Dataset[Claim],
      config: PipelineConfig = PipelineConfig()): Dataset[Candidate] = {
    val spark = claims.sparkSession
    import spark.implicits._
    Eligibility.candidates(claims.toDF(), config).as[Candidate]
  }
}
