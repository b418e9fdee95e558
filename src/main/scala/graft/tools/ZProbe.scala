package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-profiler for the q398 zorder pipeline (dev-only). */
object ZProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  ZPROBE $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }

    // build the same fixture q398 builds
    val base = graft.queries.Tables.freshFwBase("graft_fw_zprobe", sfDir)
    val spec = "k:long:8,sx:string:6,py:long:4"
    val pts = graft.queries.Tables.t(spark, sfDir, "orders").select(
      col("o_orderkey").as("k"),
      format_string("D%04d", pmod(col("o_custkey"), lit(4096L))).as("sx"),
      pmod(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")), lit(4096)).cast("long").as("py"))
    time("fixture write") {
      pts.repartitionByRange(4, col("py")).sortWithinPartitions("py")
        .write.format("graft.sources.FixedWidth")
        .option("schema", spec).mode("overwrite").save(base.toString)
    }
    def rd = spark.read.format("graft.sources.FixedWidth")
      .option("schema", spec).load(base.toString)
    (1 to 2).foreach { i =>
      println(s"-- pass $i")
      time("scan count")(rd.count())
      time("scan noop")(rd.write.format("noop").mode("overwrite").save())
      val rank = graft.functions.ZOrder.stringRank48(col("sx")).cast("double")
      time("rank noop") {
        rd.select(rank.as("r")).write.format("noop").mode("overwrite").save()
      }
      time("minmax agg") {
        rd.agg(min(rank), max(rank), min(col("py")), max(col("py"))).head()
      }
      val cuts = time("approxQuantile 255 @0.001") {
        rd.select(rank.as("r")).na.drop()
          .stat.approxQuantile("r", (1 to 255).map(_ / 256.0).toArray, 0.001)
      }.distinct.sorted
      println(s"  cuts: ${cuts.length}")
      val r = coalesce(col("_r"), lit(cuts.head - 1.0))
      val whenSum = cuts.map(b => when(lit(b) <= r, 1L).otherwise(0L))
        .reduce(_ + _)
      time("rank+whenSum(255) noop") {
        rd.withColumn("_r", rank).select((whenSum * lit(255L)).as("c"))
          .write.format("noop").mode("overwrite").save()
      }
      // binary-search variant: nested whens, depth ~8
      def bsearch(lo: Int, hi: Int): org.apache.spark.sql.Column =
        if (lo == hi) lit(lo.toLong)
        else {
          val mid = (lo + hi + 1) / 2
          when(lit(cuts(mid - 1)) <= r, bsearch(mid, hi))
            .otherwise(bsearch(lo, mid - 1))
        }
      time("rank+bsearch(255) noop") {
        rd.withColumn("_r", rank)
          .select((bsearch(0, cuts.length) * lit(255L)).as("c"))
          .write.format("noop").mode("overwrite").save()
      }
      time("whenSum repartitionByRange(16)+sort noop") {
        rd.withColumn("_r", rank).withColumn("_z", whenSum)
          .repartitionByRange(16, col("_z")).sortWithinPartitions("_z")
          .drop("_z", "_r")
          .write.format("noop").mode("overwrite").save()
      }
      if (i == 1 && sys.env.contains("ZPROBE_PLANS")) {
        def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val p = new java.io.PrintWriter(s"plans/r12/$name")
          try p.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
          finally p.close()
        }
        def bs(lo: Int, hi: Int): org.apache.spark.sql.Column =
          if (lo == hi) lit(lo.toLong)
          else {
            val mid = (lo + hi + 1) / 2
            when(lit(cuts(mid - 1)) <= r, bs(mid, hi))
              .otherwise(bs(lo, mid - 1))
          }
        dump("q398_before.txt", rd.withColumn("_r", rank)
          .withColumn("_z", whenSum)
          .repartitionByRange(16, col("_z")).sortWithinPartitions("_z")
          .drop("_z", "_r"))
        dump("q398_after.txt", rd.withColumn("_r", rank)
          .withColumn("_z", bs(0, cuts.length))
          .repartitionByRange(16, col("_z")).sortWithinPartitions("_z")
          .drop("_z", "_r"))
      }
    }
    spark.stop()
  }
}
