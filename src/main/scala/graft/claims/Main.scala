package graft.claims

import org.apache.spark.sql.SparkSession

/** CLI entry point, same contract as the reference script
  * (claim_pipeline.py:235-242): `Main <file> [<file> …]`, usage + exit 1
  * when no inputs are given. `spark-submit`-able.
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      Console.err.println(
        "Usage error: graft.claims.Main <emr_alpha.csv> [emr_beta.json ...]")
      sys.exit(1)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-claim-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = ClaimPipeline.run(spark, args.toSeq)
      println(s"Output saved to ${result.outputPath}")
      println(result.metrics.render)
    } finally spark.stop()
  }
}
