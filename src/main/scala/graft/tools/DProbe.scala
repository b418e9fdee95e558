package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch micro-profiler for the d11 PPJoin pipeline (dev-only). */
object DProbe {
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
      println(f"  DPROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
    (1 to 2).foreach { pass =>
      println(s"-- pass $pass")
      val sets0 = docs.filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"),
          graft.functions.ShinglesOf(split(col("text"), " "), 3).as("sh"))
      val sets = sets0.repartition(32, col("doc_id"))
      time("sets (shingle) noop")(noop(sets))
      val tok = sets.select(col("doc_id").as("_id"),
        size(col("sh")).as("_sz"), explode(col("sh")).as("_tok"))
        .select(col("_id"), col("_sz"),
          graft.functions.Md5Pack(col("_tok")).as("_th"))
      time("tok noop")(noop(tok))
      val wDf = Window.partitionBy("_th")
      val wRank = Window.partitionBy("_id").orderBy(col("_df"), col("_th"))
      val withDf = tok.withColumn("_df", count(lit(1)).over(wDf))
      time("tok+df window noop")(noop(withDf))
      val prefix = withDf
        .withColumn("_pos", row_number().over(wRank))
        .filter(col("_pos") <= col("_sz") - ceil(col("_sz") * 0.5) + 1)
        .select("_id", "_th", "_sz")
      time("prefix (df+rank windows) noop")(noop(prefix))
      val prefixP = prefix.persist()
      time("prefix persist count")(prefixP.count())
      val cand0 = graft.operators.BucketedPairs
        .pairs(prefixP, Seq("_th"),
          struct(col("_id").as("i"), col("_sz").as("s")), 1000)
        .filter(least(col("x")("s"), col("y")("s"))
          >= lit(0.5) * greatest(col("x")("s"), col("y")("s")))
        .select(col("x")("i").as("a_id"), col("y")("i").as("b_id"))
      time("bucket walk (pre-distinct) noop")(noop(cand0))
      val cand = cand0.distinct().persist()
      time("cand distinct+persist count")(cand.count())
      val candIds = cand.select(col("a_id").as("doc_id"))
        .union(cand.select(col("b_id").as("doc_id"))).distinct()
      val candSets = sets0.join(candIds, Seq("doc_id"), "left_semi").persist()
      time("candSets persist")(candSets.count())
      val inter = size(array_intersect(col("_a"), col("_b")))
      val uni = size(array_union(col("_a"), col("_b")))
      val out = cand
        .join(candSets.select(col("doc_id").as("a_id"), col("sh").as("_a")),
          "a_id")
        .join(candSets.select(col("doc_id").as("b_id"), col("sh").as("_b")),
          "b_id")
        .select(col("a_id"), col("b_id"), (inter / uni).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      time("verify joins noop")(noop(out))
      time("orderBy count")(out.orderBy("a_id", "b_id").count())
      // variant: union from sizes (sets are distinct-element arrays)
      val out2 = cand
        .join(candSets.select(col("doc_id").as("a_id"), col("sh").as("_a"),
          size(col("sh")).as("_sza")), "a_id")
        .join(candSets.select(col("doc_id").as("b_id"), col("sh").as("_b"),
          size(col("sh")).as("_szb")), "b_id")
        .select(col("a_id"), col("b_id"),
          (inter.cast("double") /
            (col("_sza") + col("_szb") - inter)).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      time("verify sizes-union noop")(noop(out2))
      // variant: sorted hashed-long arrays + built-in intersect
      val candSetsH = sets0.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), size(col("sh")).as("_sz"),
          sort_array(transform(col("sh"),
            x => graft.functions.Md5Pack(x))).as("shh"))
        .persist()
      time("candSetsH persist")(candSetsH.count())
      val interH = size(array_intersect(col("_a"), col("_b")))
      val out3 = cand
        .join(candSetsH.select(col("doc_id").as("a_id"), col("shh").as("_a"),
          col("_sz").as("_sza")), "a_id")
        .join(candSetsH.select(col("doc_id").as("b_id"), col("shh").as("_b"),
          col("_sz").as("_szb")), "b_id")
        .select(col("a_id"), col("b_id"),
          (interH.cast("double") /
            (col("_sza") + col("_szb") - interH)).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      time("verify hashed sizes-union noop")(noop(out3))
      time("counts: base/sizes/hashed")(
        println(s"  n=${out.count()}/${out2.count()}/${out3.count()}"))
      candSetsH.unpersist(true)
      prefixP.unpersist(true); cand.unpersist(true); candSets.unpersist(true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
