package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 111: Misra–Gries heavy hitters and the
  * count–min sketch.
  */
class Round9lSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("MgSketch: candidate set is a proven superset of the frequent items") {
    import spark.implicits._
    // Skewed stream: item "hh" holds 30% of the mass, 400 distinct
    // fillers share the rest — with k=50 anything above N/51 must survive.
    val rows = (1 to 3000).map(i => s"f${i % 400}") ++ Seq.fill(1300)("hh")
    val cands = rows.toDF("item")
      .repartition(8) // force multi-partition partials + a merge
      .agg(graft.functions.MgSketch.candidates(org.apache.spark.sql.functions.col("item"), 50))
      .collect().head.getSeq[String](0)
    assert(cands.size <= 50, "buffer bound violated")
    assert(cands.contains("hh"), "guaranteed heavy item dropped")
    assert(cands == cands.sorted, "deterministic ascending rendering")
  }

  test("q265: output matches the exact unsketchted frequent-token answer") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q265_heavy_hitters")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "sf0.001 corpus should have >0.2% tokens")
    // Ground truth computed WITHOUT the sketch path.
    val toks = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val n = toks.count()
    val truth = toks.groupBy("tok").count()
      .filter(col("count") * 500 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.map(_._1).toSet === truth.keySet, "frequent set differs")
    out.foreach { case (tok, freq, nt) =>
      assert(freq === truth(tok)); assert(nt === n)
    }
  }

  test("q266: count-min estimates dominate exact counts; 10 probes") {
    val rows = graft.SparkEntry.queries("q266_countmin")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length === 10)
    assert(rows.map(_._1).distinct.length === 10)
    rows.foreach { case (tok, freq, est, over) =>
      assert(est >= freq, s"CM under-estimated $tok: $est < $freq")
      assert(over === est - freq)
      assert(freq > 0)
    }
  }
}
