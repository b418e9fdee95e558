package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: write `.explain("formatted")` of named queries to files —
  * the plans/r12 evidence trail. Usage:
  *   PlanDump <name>[,<name>...] <outDir> <suffix>
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
        try p.println(txt) finally p.close()
        println(s"PLANDUMP OK $name")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP FAIL $name: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
