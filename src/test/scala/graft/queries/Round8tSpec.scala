package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 90: fingerprint order-independence and
  * timecode well-formedness (including the drop-frame rule).
  */
class Round8tSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q244: digests stable under repartition (order independence)") {
    import org.apache.spark.sql.functions._
    val base = graft.SparkEntry.queries("q244_table_fingerprint")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // recompute the nation digest over a deliberately reshuffled frame
    val n = Tables.t(spark, Sf, "nation").repartition(7)
    val m = 2305843009213693951L
    val h = pmod(graft.functions.Md5Pack(concat_ws("|",
      col("n_nationkey"), col("n_name"), col("n_regionkey"))), lit(m))
    val fp = n.agg((sum(h.cast("decimal(38,0)"))
        % lit(m).cast("decimal(38,0)")).cast("long"))
      .collect().head.getLong(0)
    assert(fp == base("nation"))
  }

  test("m22: timecodes well-formed; dropped frames never appear") {
    val rows = graft.SparkEntry.queries("m22_dropframe_timecode")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val Pat = """(\d{2}):(\d{2}):(\d{2});(\d{2})""".r
    rows.foreach { case (_, tc) =>
      tc match {
        case Pat(_, mm, ss, ff) =>
          assert(mm.toInt < 60 && ss.toInt < 60 && ff.toInt < 30)
          // drop-frame law: at second 0 of a non-10th minute, frames
          // 00 and 01 do not exist
          if (ss.toInt == 0 && mm.toInt % 10 != 0)
            assert(ff.toInt >= 2, s"dropped frame visible in $tc")
        case _ => fail(s"malformed timecode $tc")
      }
    }
  }
}
