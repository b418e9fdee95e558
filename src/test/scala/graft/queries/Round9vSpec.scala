package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-equality pins for the native kernels that replaced declarative
  * (interpreted-HOF) formulations in round 5.
  */
class Round9vSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("WinnowPrints equals the transform/aggregate SQL formulation") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("text").isNotNull &&
        size(split(col("text"), " ")) >= 8)
    val native = docs.select(col("doc_id"), explode(
        graft.functions.WinnowPrints(split(col("text"), " "), 5, 4))
        .as("fp"))
      .select(col("doc_id"), col("fp.h"), col("fp.p"))
      .collect().map(_.toSeq).toSet
    val sql = docs.select(col("doc_id"), explode(expr(
        """element_at(transform(array(split(text, ' ')), toks ->
          |  element_at(transform(array(
          |      transform(sequence(0, size(toks) - 5), i ->
          |        md5_pack(array_join(slice(toks, i + 1, 5), ' ')))),
          |    hs ->
          |      transform(sequence(0, size(hs) - 4), j ->
          |        aggregate(sequence(j, j + 3),
          |          named_struct('h', CAST(9223372036854775807 AS BIGINT),
          |                       'p', -1),
          |          (acc, p) -> IF(hs[p] <= acc.h,
          |            named_struct('h', hs[p], 'p', p), acc)))), 1)), 1)"""
          .stripMargin)).as("fp"))
      .select(col("doc_id"), col("fp.h"), col("fp.p"))
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty)
    assert(native === sql)
  }

  test("Pcm16WindowEnergies equals the per-sample hex/conv decode") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("text").isNotNull)
    val native = docs.select(col("doc_id"),
        posexplode(graft.functions.Pcm16WindowEnergies(
          encode(concat(col("text"), lit("ÿÿ")), "UTF-8"), 64))
          .as(Seq("w0", "e")))
      .select(col("doc_id"), col("w0").cast("long").as("w"), col("e"))
      .collect().map(_.toSeq).toSet
    val declarative = docs
      .select(col("doc_id"),
        hex(encode(concat(col("text"), lit("ÿÿ")), "UTF-8"))
          .as("hx"),
        (octet_length(encode(concat(col("text"), lit("ÿÿ")),
          "UTF-8")) / 2).cast("long").as("n_smp"))
      .filter(col("n_smp") > 0)
      .select(col("doc_id"), col("hx"),
        posexplode(expr("sequence(0L, n_smp - 1)")))
      .select(col("doc_id"), expr("pos div 64").as("w"),
        expr("""pow(((CAST(conv(concat(
               |  substring(hx, CAST(pos*4+3 AS INT), 2),
               |  substring(hx, CAST(pos*4+1 AS INT), 2)), 16, 10) AS BIGINT)
               |  + 32768) % 65536) - 32768, 2)""".stripMargin)
          .cast("long").as("v2"))
      .groupBy("doc_id", "w").agg(sum(col("v2")).as("e"))
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty)
    assert(native === declarative)
  }

  test("Pcm16Loudness matches an independent per-row recomputation") {
    val rows = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        graft.functions.Pcm16Loudness(
          encode(concat(col("text"), lit("ÿÿ")), "UTF-8"))
          .as("st"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = (r.getString(1) + "ÿÿ").getBytes("UTF-8")
      val n = bytes.length / 2
      val smp = (0 until n).map { i =>
        val u = (bytes(2 * i) & 0xff) | ((bytes(2 * i + 1) & 0xff) << 8)
        if (u >= 32768) u - 65536L else u.toLong
      }
      val st = r.getStruct(2)
      assert(st.getLong(0) === n.toLong)
      assert(st.getLong(1) === smp.map(v => v * v).sum)
      if (n > 0 && smp.map(v => v * v).sum > 0) {
        val rms = BigDecimal(math.sqrt(smp.map(v => v * v).sum.toDouble / n))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(st.getDouble(2) === rms)
        val gain = BigDecimal(3276.8 / rms)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(st.getDouble(3) === gain)
        assert(st.getLong(4) ===
          smp.count(v => math.abs(v.toDouble * gain) > 32767.0).toLong)
      }
    }
  }
}
