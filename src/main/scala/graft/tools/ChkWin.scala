import org.apache.spark.sql.SparkSession
object ChkWin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("d32_lsh_recall", "q155_rfm_segments", "q21_corr_max_order")) {
      val p = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val lines = p.linesIterator.filter(_.contains("Window [")).toSeq
      println(s"== $q: ${lines.size} Window lines")
      lines.take(3).foreach(l => println("   " + l.trim.take(200)))
    }
    spark.stop()
  }
}
