package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 113: association rules and the radius join. */
class Round9nSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q269: rule identities — symmetric support, confidence in (0,1]") {
    val rows = graft.SparkEntry.queries("q269_assoc_rules")(spark, Sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (nab, supp, conf, lift)) =>
      assert(nab > 0 && supp > 0 && supp <= 1)
      assert(conf > 0 && conf <= 1)
      assert(lift > 0)
      // The reverse rule shares n_ab and support when it passes the
      // same threshold (it always does — threshold is on n_ab alone).
      val rev = rows((b, a))
      assert(rev._1 === nab, "pair count is direction-free")
      assert(rev._2 === supp, "support is direction-free")
    }
  }

  test("q270: grid-blocked result equals the brute-force all-pairs answer") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q270_radius_join")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Brute force in local Scala over the same md5-pack coordinates.
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val supp = spark.read.parquet(s"$Sf/supplier.parquet")
      .select(col("s_suppkey").cast("long")).collect().map(_.getLong(0))
    def coordLocal(salt: String, k: Long): Long =
      math.floorMod(graft.functions.Md5Hash.pack(
        (salt + k.toString).getBytes("UTF-8")), 10000L)
    val sp = supp.map(s => (s, coordLocal("pt_x_", s), coordLocal("pt_y_", s)))
    val expect = cust.flatMap { ck =>
      val (x, y) = (coordLocal("pt_x_", ck), coordLocal("pt_y_", ck))
      val within = sp.map { case (_, sx, sy) =>
        (x - sx) * (x - sx) + (y - sy) * (y - sy)
      }.filter(_ <= 600L * 600L)
      if (within.isEmpty) None
      else Some((ck, within.length.toLong, within.min))
    }.toSet
    assert(got === expect)
  }
}
