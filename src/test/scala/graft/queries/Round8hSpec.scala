package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 78: cumulative-distinct equals the naive
  * per-prefix distinct, and stemming never grows the vocabulary.
  */
class Round8hSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q230: running total equals a naive distinct over each prefix") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q230_cumulative_distinct")(spark, Sf)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(4))).toMap
    val raw = Tables.t(spark, Sf, "lineitem")
      .filter(col("l_suppkey") <= 40)
      .select(col("l_suppkey"), col("l_partkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("mk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.foreach { case ((supp, mk), cum) =>
      val naive = raw.filter(t => t._1 == supp && t._3 <= mk)
        .map(_._2).distinct.length
      assert(cum == naive, s"supp $supp mk $mk")
    }
  }

  test("t40: stemmed vocabulary never exceeds the raw vocabulary") {
    val rows = graft.SparkEntry.queries("t40_suffix_stem")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (raw, stemmed, shrink) =>
      assert(stemmed <= raw)
      assert(shrink >= 0.0 && shrink < 1.0)
    }
  }

  test("t40: the rule chain folds plural families on a hand-built doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // classes/class + ponies/poni + cats/cat fold; 'glass' keeps its ss
    val df = Seq((1L, "classes class ponies poni cats cat glass"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("t40probe")
    val folded = df
      .select(size(array_distinct(split(col("text"), " "))).as("raw"),
        size(array_distinct(transform(split(col("text"), " "), tok =>
          regexp_replace(regexp_replace(regexp_replace(tok,
            "sses$", "ss"), "ies$", "i"), "([^s])s$", "$1")))).as("st"))
      .collect().head
    assert(folded.getInt(0) == 7)
    assert(folded.getInt(1) == 4) // class, poni, cat, glass
  }
}
