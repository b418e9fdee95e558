package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShinglesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("shingles: short documents yield empty sets, not ANSI index errors") {
    import spark.implicits._
    val df = Seq("", "one", "one two", "one two three",
      "a b c d").toDF("text")
    val got = df.select(TextOps.shingles(col("text")).as("sh"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) === Nil)
    assert(got(1) === Nil)
    assert(got(2) === Nil)
    assert(got(3) === List("one two three"))
    assert(got(4) === List("a b c", "b c d"))
  }

  test("MinHashOf per-row fold equals the declarative min(mdHashes) aggregate") {
    // The d3/d4 signature stage folds all 8 minima per row (zero
    // shuffles); this pins it to the exploded groupBy-min reference
    // formulation it replaced — minima are order-independent, so the two
    // must be bit-identical.
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val ex = docs.select(col("doc_id"),
      explode(TextOps.shingles(col("text"))).as("tok"))
    val aggs = TextOps.mdHashes(col("tok")).zipWithIndex
      .map { case (h, i) => min(h).as(s"mh$i") }
    val ref = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val fast = graft.SparkEntry.queries("d3_minhash_sig")(spark, "/root/testdata/sf0.001")
    assert(fast.collect().toSeq.map(_.toSeq).toSet
      === ref.orderBy("doc_id").collect().toSeq.map(_.toSeq).toSet)
    assert(fast.count() === 500)
  }

  test("NULL document text flows safely through text/multimodal operators") {
    import spark.implicits._
    val docs = Seq((1L, "real text here words", "src0", "en"),
        (2L, null.asInstanceOf[String], "src1", "en"))
      .toDF("doc_id", "text", "source", "lang")

    // Shingles: NULL → empty set (no ANSI error, no phantom rows).
    val sh = docs.select(TextOps.shingles(col("text")).as("s")).collect()
    assert(sh(1).getSeq[String](0).isEmpty)

    // Fingerprint-style guard: NULL stays NULL, never md5("").
    val fp = docs.select(
        when(col("text").isNull, lit(null).cast("string"))
          .otherwise(md5(concat_ws(" ", array_sort(split(lower(col("text")), " ")))))
          .as("f")).collect()
    assert(!fp(0).isNullAt(0) && fp(1).isNullAt(0))

    // Multimodal: NULL payload dropped at the boundary, codec never NPEs.
    val media = graft.mm.Multimodal.mediaFromDocuments(docs)
    assert(media.count() === 1)
    assert(graft.mm.Multimodal.decodeAll(media).count() === 1)
  }
}
