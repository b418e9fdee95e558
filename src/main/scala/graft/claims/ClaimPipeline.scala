package graft.claims

import org.apache.spark.sql.{DataFrame, Observation, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** End-to-end run result (reference `pipeline()` returns
  * `{output_path, candidates, metrics_path}`, claim_pipeline.py:233; we
  * additionally expose the metrics struct — SURVEY §3.2).
  */
final case class PipelineResult(
    outputPath: String,
    candidates: Seq[Row],
    metricsPath: String,
    metrics: PipelineMetrics,
)

/** The full resubmission pipeline: dispatch → normalize → union → eligibility
  * → enrich → sinks + metrics, in ONE Spark job (metrics ride the candidate
  * scan via `Dataset.observe`). Mirrors reference claim_pipeline.py:155-233.
  */
object ClaimPipeline {
  private val logger = LoggerFactory.getLogger(getClass)

  /** Read + normalize one input file, dispatched by extension
    * (claim_pipeline.py:177-183): `.csv` → alpha, `.json` → beta, anything
    * else warns and is skipped with no metrics effect (SURVEY §2.3 S10).
    *
    * Returns the normalized frame with bookkeeping columns `_corrupt`,
    * `_file_seq`, `_row_seq` (the latter two restore the reference's
    * input-order output determinism — SURVEY §7.4 item 2; claim-file inputs
    * are small config-like extracts, so the single-partition read that makes
    * `monotonically_increasing_id` sequential is acceptable; the large-scale
    * path sets preserveInputOrder=false and skips it).
    */
  private def loadFile(spark: SparkSession, path: String, fileSeq: Int,
      preserveOrder: Boolean, loaderParity: Boolean): Option[DataFrame] = {
    // Order preservation forces a single-partition read (the only way
    // monotonically_increasing_id is sequential); the scale path
    // (preserveOrder=false) keeps the parallel multi-split scan.
    def shaped(df: DataFrame) = if (preserveOrder) df.coalesce(1) else df
    val normalized =
      if (path.endsWith(".csv"))
        Some(Normalize.normalizeAlpha(shaped(
          spark.read.option("header", "true").option("mode", "PERMISSIVE")
            .csv(path))))
      else if (path.endsWith(".json"))
        // loaderParity (S11): the VARIANT re-parse additionally flags
        // records the reference loader would raise on as corrupt.
        Some(Normalize.normalizeBeta(shaped(
          if (loaderParity) Normalize.betaRawLoaderParity(spark, path)
          else spark.read.option("multiLine", "true").option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .schema(Schemas.betaRaw).json(path))))
      else {
        logger.warn(s"Unsupported file type: $path")
        None
      }
    normalized.map { df =>
      val seq =
        if (preserveOrder) monotonically_increasing_id()
        else lit(0L)
      df.withColumn("_file_seq", lit(fileSeq)).withColumn("_row_seq", seq)
    }
  }

  /** Run the pipeline over `files`, writing the pretty-JSON candidates array
    * and the metrics text file, and returning both materialized results.
    */
  def run(
      spark: SparkSession,
      files: Seq[String],
      config: PipelineConfig = PipelineConfig(),
      outputPath: String = "resubmission_candidates.json",
      metricsPath: String = "pipeline_metrics.log",
      preserveInputOrder: Boolean = true,
  ): PipelineResult = {
    require(!config.bugCompatFileAbort || preserveInputOrder,
      "bugCompatFileAbort needs per-file row order (preserveInputOrder)")
    var fileMalformed = 0L
    val frames = files.zipWithIndex.flatMap { case (path, i) =>
      // File-level error isolation (claim_pipeline.py:213-215): an unreadable
      // / missing file logs, counts one malformed, and is skipped.
      try loadFile(spark, path, i, preserveInputOrder, config.bugCompatFileAbort)
      catch {
        case e: Exception =>
          logger.warn(s"Failed to process file $path: ${e.getMessage}")
          fileMalformed += 1
          None
      }
    }

    val unioned: DataFrame = frames match {
      case Seq() =>
        import org.apache.spark.sql.types._
        val schema = Schemas.claim
          .add("_corrupt", BooleanType)
          .add("_file_seq", IntegerType)
          .add("_row_seq", LongType)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case fs => fs.reduce(_.unionByName(_))
    }

    // S11 file-abort bug-compat (claim_pipeline.py:213-215): the first
    // corrupt record of a file keeps the file's prior rows, counts
    // malformed ONCE, and drops the rest. Keeping rows up to AND INCLUDING
    // the first corrupt one reproduces exactly that: the retained corrupt
    // row contributes the single malformed count via the observe pass
    // (it is excluded from total_processed and from candidates already),
    // and everything after it vanishes. The per-file first-corrupt frame
    // is at most one row per input file — broadcast by size.
    val claims: DataFrame =
      if (!config.bugCompatFileAbort) unioned
      else {
        // Persisted: firstBad and the main pass both consume the load
        // lineage; without the cache every file would be wholetext-read
        // and VARIANT-re-parsed twice. Claim files are small config-like
        // extracts, so caching the normalized union is cheap.
        val loaded = unioned.persist()
        val firstBad = loaded.filter(col("_corrupt"))
          .groupBy(col("_file_seq")).agg(min(col("_row_seq")).as("_abort_seq"))
        loaded.join(broadcast(firstBad), Seq("_file_seq"), "left")
          .filter(col("_abort_seq").isNull || col("_row_seq") <= col("_abort_seq"))
          .drop("_abort_seq")
      }

    // Derived columns share the classifier/age subtrees (see
    // Eligibility.withDerived) — inlining eligible+exclusion expressions
    // here doubled whole-stage-codegen compile time.
    val derived = Eligibility.withDerived(claims, config)
    val eligible = col("eligible")
    val exclusion = col("exclusion_reason")

    val obs = Observation()
    val metricExprs = PipelineMetrics.aggExprs(
      eligible, exclusion, col("source_system"), col("_corrupt"))
    val observed = derived.observe(obs, metricExprs.head, metricExprs.tail: _*)

    val candidateCols = Seq(
      col("claim_id"),
      col("denial_reason").as("resubmission_reason"),
      col("source_system"),
      Eligibility.recommendedChanges(col("denial_reason"))
        .as("recommended_changes"),
    )
    val projected = observed
      .filter(eligible && !claims("_corrupt"))
      .select(candidateCols ++ Seq(col("_file_seq"), col("_row_seq")): _*)
    val ordered =
      if (preserveInputOrder) projected.orderBy(col("_file_seq"), col("_row_seq"))
      else projected
    val candidatesDf = ordered.drop("_file_seq", "_row_seq")

    // Single action: collect (bounded) candidates; the observe node sees every
    // input row because the filter sits downstream of it.
    val candidateRows = Sinks.writeCandidatesPretty(candidatesDf, outputPath)

    val metrics = PipelineMetrics.fromObserved(
      obs.get, fileMalformed, config.bugCompatMetrics)
    Sinks.writeMetrics(metrics, metricsPath)

    // The bug-compat cache is only needed for this run's single action.
    if (config.bugCompatFileAbort) unioned.unpersist(blocking = false)

    PipelineResult(outputPath, candidateRows, metricsPath, metrics)
  }
}
