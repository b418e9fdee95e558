// lives in graft.queries for access to the private[queries] helpers
package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-profiler for the s-family graph ANN queries (dev-only). */
object SProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  SPROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"-- pass $pass")
      val e = time("emb scan+count")(
        TextOps83.emb(spark, sfDir))
      val n = time("e.count")(e.count())
      val bs = time("descend 3 rounds")(
        TextOps83.descend(spark, e, n, 3))
      val graph = time("undirected+checkpoint")(
        TextOps83.undirected(bs.last).localCheckpoint(true))
      val slots = e.select(col("vec_id").as("v"),
        pmod(graft.functions.Md5Pack(
          concat(lit("nnd_"), col("vec_id"))), lit(n)).as("slot"))
      val entries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("u"),
          explode(expr("sequence(1, 8)")).as("j"))
        .select(col("u"), pmod(graft.functions.Md5Pack(
          concat_ws("_", lit("s39"), col("u"), col("j"))),
          lit(n)).as("slot"))
        .join(slots, "slot").select("u", "v").distinct()
      val sc = TextOps83.score(e) _
      val f0 = time("hop0 (score+topK+ckpt)")(
        TextOps83.topK(10)(sc(entries)).localCheckpoint(true))
      val f1 = time("hop1") {
        val nb = f0.as("f").join(graph.as("g"), col("f.v") === col("g.u"))
          .select(col("f.u").as("u"), col("g.v").as("v"))
          .unionAll(f0).distinct()
        TextOps83.topK(10)(sc(nb)).localCheckpoint(true)
      }
      if (pass == 2 && sys.env.contains("SPROBE_PLANS")) {
        val nb = f0.as("f").join(graph.as("g"), col("f.v") === col("g.u"))
          .select(col("f.u").as("u"), col("g.v").as("v"))
          .unionAll(f0).distinct()
        val hop = TextOps83.topK(10)(sc(nb))
        hop.write.format("noop").mode("overwrite").save()
        println("==== hop executed plan (post-AQE) ====")
        println(hop.queryExecution.executedPlan.toString.take(10000))
        println("==== one descend round plan ====")
        val g = TextOps83.undirected(bs.head)
        val cand = g.as("g1").join(g.as("g2"), col("g1.v") === col("g2.u"))
          .select(col("g1.u").as("u"), col("g2.v").as("v"))
          .filter(col("u") =!= col("v"))
          .unionAll(bs.head.select("u", "v")).distinct()
        val rnd = sc(cand)
        rnd.write.format("noop").mode("overwrite").save()
        println(rnd.queryExecution.executedPlan.toString.take(10000))
      }
      val f23 = time("hop2+hop3") {
        (1 to 2).foldLeft(f1) { (f, _) =>
          val nb = f.as("f").join(graph.as("g"), col("f.v") === col("g.u"))
            .select(col("f.u").as("u"), col("g.v").as("v"))
            .unionAll(f).distinct()
          TextOps83.topK(10)(sc(nb)).localCheckpoint(true)
        }
      }
      // round-structure variants over b3 (the last build frame)
      val b = bs.last
      def roundFrom(g: org.apache.spark.sql.DataFrame) = {
        val cand = g.as("g1").join(g.as("g2"), col("g1.v") === col("g2.u"))
          .select(col("g1.u").as("u"), col("g2.v").as("v"))
          .filter(col("u") =!= col("v"))
          .unionAll(b.select("u", "v")).distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("u").orderBy(col("cos").desc, col("v").asc)
        sc(cand).withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .write.format("noop").mode("overwrite").save()
      }
      val gD = TextOps83.undirected(b)
      val uv = b.select("u", "v")
      val gA = uv.unionAll(uv.select(col("v").as("u"), col("u").as("v")))
      println(s"  SPROBE g sizes: distinct=${gD.count()} all=${gA.count()}")
      time("round: undirected inline (current)")(roundFrom(gD))
      time("round: undirected checkpointed")(
        roundFrom(gD.localCheckpoint(true)))
      time("round: no-distinct undirected")(roundFrom(gA))
      val exact = time("exactPanel persist+count") {
        val x = TextOps83.exactPanel(e).persist()
        x.count(); x
      }
      time("audit") {
        val answer = TextOps83.topK(5)(
          sc(f23).filter(col("u") =!= col("v")))
        val possible = exact.agg(count(lit(1)).as("possible"))
        val hits = answer.intersect(exact).agg(count(lit(1)).as("hits"))
        hits.crossJoin(broadcast(possible)).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
