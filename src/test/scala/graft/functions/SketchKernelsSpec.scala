package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests of the per-row sketch kernels
  * (ShinglesOf / MinHashOf / SimHashOf) against the declarative
  * formulations they replaced. The kernels carry the d3/d4/d5 hot path,
  * so their equivalence is pinned on generated documents covering the
  * awkward shapes: empty strings, repeated words, multi-space runs,
  * unicode, and sub-width documents.
  */
class SketchKernelsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val genWord = Gen.oneOf(
    Gen.oneOf("the", "a", "spark", "engine", "café", "文字", "x"),
    Gen.alphaNumStr.map(_.take(5)))
  private val genDoc = Gen.chooseNum(0, 12).flatMap(n =>
    Gen.listOfN(n, genWord).map(_.mkString(" ")))

  private def docs(seed: Long) = {
    import spark.implicits._
    val texts = Gen.listOfN(200, genDoc)
      .apply(Gen.Parameters.default, Seed(seed)).get
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("ShinglesOf equals transform(sequence)+concat_ws+array_distinct") {
    val df = docs(7L)
    val tk = split(col("text"), " ")
    val n = size(tk)
    val declarative = array_distinct(
      when(n >= 3, transform(sequence(lit(1), n - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
          element_at(tk, i + 2))))
        .otherwise(array().cast("array<string>")))
    val diff = df.select(col("doc_id"),
        ShinglesOf(tk, 3).as("k"), declarative.as("d"))
      .filter(not(col("k") <=> col("d")))
    assert(diff.count() === 0, diff.collect().take(3).mkString("; "))
  }

  test("MinHashOf equals explode + groupBy min over the md5 KM hashes") {
    val df = docs(11L).filter(size(split(col("text"), " ")) >= 1)
    val fast = df.select(col("doc_id"),
      MinHashOf(split(col("text"), " "), 8).as("mh"))
    val ex = df.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val packed = Md5Pack(col("tok"))
    val h1 = shiftright(packed, 31)
    val h2 = packed.bitwiseAND(lit(0x7fffffffL))
    val aggs = (0 until 8).map(i =>
      min((h1 + lit(i + 1) * h2) % 2147483647L).as(s"m$i"))
    val ref = ex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until 8).map(i => col(s"m$i")): _*).as("mh"))
    assert(fast.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      === ref.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap)
  }

  test("SimHashOf (md5 kind) equals the 64x sum(CASE) vote aggregation") {
    val df = docs(13L).filter(size(split(col("text"), " ")) >= 1)
    val fast = df.select(col("doc_id"),
        SimHashOf(array_distinct(split(col("text"), " ")),
          SketchOps.HashMd5Pack).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ex = df.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val h = Md5Pack(col("tok"))
    val voteAggs = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val votes = ex.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
    val sig = (0 until 64)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val ref = votes.select(col("doc_id"), sig.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === ref)
  }

  test("RepStatsOf equals a plain-Scala frequency model") {
    val df = docs(13L)
    val got = df.select(col("doc_id"), col("text"),
        RepStatsOf(split(col("text"), " ")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2)))
    got.foreach { case (_, text, s) =>
      val tk = text.split(" ", -1).toSeq
      val tokFreq = tk.groupBy(identity).view.mapValues(_.size.toLong)
      val bigrams = tk.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val bgFreq = bigrams.groupBy(identity).view.mapValues(_.size.toLong)
      val expect = Seq(
        tk.size.toLong,
        tokFreq.size.toLong,
        tokFreq.values.filter(_ >= 2).sum,
        if (bgFreq.isEmpty) 0L else bgFreq.values.max,
        bigrams.size.toLong)
      assert(s === expect, s"text=${text.take(80)}")
    }
  }

  test("sketch kernels are SQL-callable after register()") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT shingles_of(split('a b c d', ' '), 3) AS sh,
        |  minhash_of(split('a b c', ' '), 2) AS mh,
        |  simhash_of(split('a b c', ' ')) AS s_xx,
        |  simhash_of(split('a b c', ' '), 1) AS s_md5,
        |  md5_pack('a') AS mp""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(row.getSeq[Long](1).length === 2)
    assert(row.getLong(2) !== row.getLong(3)) // different hash kinds
    assert(row.getLong(4) === Md5Hash.pack("a".getBytes("UTF-8")))
  }
}
