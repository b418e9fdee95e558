package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the d30/q161 batch: chunks tile every document
  * exactly, boundaries are content-defined, and stickiness stays in
  * its (1/n_days, 1] feasibility band.
  */
class Round6mSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("d30: chunks tile the corpus; duplicates exist across near-dups") {
    val r = q("d30_cdc_chunks").collect().head
    val (nChunks, nUnique, totalBytes) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val expBytes = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull && length(col("text")) >= 16)
      .agg(sum(length(col("text")).cast("long")))
      .collect().head.getLong(0)
    assert(totalBytes === expBytes, "chunks do not tile the corpus")
    assert(nUnique <= nChunks)
    // the corpus carries near-duplicates (d4 finds pairs), so shared
    // chunks must appear
    assert(nUnique < nChunks, "no duplicate chunks found")
    assert(r.getDouble(3) > 0.0)
    // mask 64 targets ~64-byte chunks; sanity band around it
    assert(r.getDouble(4) > 16.0 && r.getDouble(4) < 512.0)
  }

  test("d30: a one-char edit only reshapes chunks near the edit") {
    // content-defined property, checked sequentially on one document
    val text = Tables.t(spark, Sf, "documents")
      .filter(col("doc_id") === 0).collect().head.getAs[String]("text")
    // the engine itself decides boundaries (no reimplementation drift)
    def chunksOf(s: String): Seq[String] = {
      import spark.implicits._
      val df = Seq((0L, s)).toDF("doc_id", "text")
        .withColumn("len", length(col("text")))
        .select(col("doc_id"), col("text"), col("len"),
          explode(sequence(lit(16), col("len"))).as("i"))
        .filter(pmod(graft.functions.Md5Pack(
          expr("substring(text, i - 15, 16)")), lit(64)) === 0
          || col("i") === col("len"))
      val bs = df.select(col("i").cast("long")).collect().map(_.getLong(0))
        .sorted
      val starts = 1L +: bs.dropRight(1).map(_ + 1)
      starts.zip(bs).map { case (st, e) =>
        s.substring(st.toInt - 1, e.toInt) }
    }
    val orig = chunksOf(text)
    val edited = chunksOf(text.updated(text.length / 2, 'Z'))
    val shared = orig.toSet & edited.toSet
    // far-from-edit chunks must survive the edit untouched
    assert(shared.nonEmpty, "edit reshaped every chunk (not content-defined)")
  }

  test("q161: stickiness within feasibility band; months cover events") {
    val rows = q("q161_stickiness").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (ym, nDays, dauSum, mau, st) =>
      assert(ym >= 190001 && ym <= 210012)
      assert(nDays >= 1 && nDays <= 31)
      // avg DAU ≤ MAU, and ≥ MAU/n_days (each monthly active shows up
      // on at least one day)
      assert(st <= 1.0 + 1e-9)
      assert(st >= 1.0 / nDays - 1e-9)
      assert(dauSum >= mau)
    }
  }
}
