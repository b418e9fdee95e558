package graft.claims

import org.apache.spark.sql.SparkSession

/** CLI entry point, same contract as the reference script
  * (claim_pipeline.py:235-242): `Main <file> [<file> …]`, usage + exit 1
  * when no inputs are given. `spark-submit`-able.
  *
  * `GRAFT_PRESERVE_ORDER=false` switches to the scale path: inputs read
  * with parallel multi-split scans (16 MB splits so even one large file
  * fans out) and candidate order is not the reference's input order.
  * Default preserves byte-level reference parity.
  *
  * The library's bug-compat parity modes (SURVEY §2.3 S9/S11) are
  * reachable from the CLI too, so the reference's outputs reproduce
  * byte-for-byte without writing Scala:
  *  - `GRAFT_BUG_COMPAT_METRICS=true` reproduces the reference's
  *    swallowed-KeyError metrics counters (claim_pipeline.py:198-205),
  *    e.g. `malformed: 5` on the sample data.
  *  - `GRAFT_BUG_COMPAT_FILE_ABORT=true` reproduces the mid-file abort
  *    (claim_pipeline.py:213-215; requires order preservation, so it
  *    refuses under GRAFT_PRESERVE_ORDER=false).
  */
object Main {
  /** The CLI's environment contract, separated for testability:
    * returns (pipeline config, preserveInputOrder).
    */
  def configFromEnv(
      env: Map[String, String]): (PipelineConfig, Boolean) = {
    def flag(name: String): Boolean =
      env.getOrElse(name, "false").toBoolean
    (PipelineConfig(
      bugCompatMetrics = flag("GRAFT_BUG_COMPAT_METRICS"),
      bugCompatFileAbort = flag("GRAFT_BUG_COMPAT_FILE_ABORT")),
      env.getOrElse("GRAFT_PRESERVE_ORDER", "true").toBoolean)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      Console.err.println(
        "Usage error: graft.claims.Main <emr_alpha.csv> [emr_beta.json ...]")
      sys.exit(1)
    }
    val (config, preserveOrder) = Main.configFromEnv(sys.env)
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-claim-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (!preserveOrder)
      builder.config("spark.sql.files.maxPartitionBytes", 16L * 1024 * 1024)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = ClaimPipeline.run(spark, args.toSeq, config = config,
        preserveInputOrder = preserveOrder)
      println(s"Output saved to ${result.outputPath}")
      println(result.metrics.render)
    } finally spark.stop()
  }
}
