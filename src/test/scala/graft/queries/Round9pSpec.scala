package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 115: EWMA trend and grid DBSCAN. */
class Round9pSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q273: first month's EWMA equals its revenue; values stay in range") {
    val rows = graft.SparkEntry.queries("q273_ewma")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getDate(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, months) =>
      val seq = months.sortBy(_._2.toString)
      // Debiased EWMA of a single observation is that observation.
      assert(math.abs(seq.head._4 - seq.head._3) < 0.01,
        "first month's smoothed value = raw value")
      val (lo, hi) = (seq.map(_._3).min, seq.map(_._3).max)
      seq.foreach { case (_, _, _, e) =>
        assert(e >= lo - 0.01 && e <= hi + 0.01,
          "a weighted mean cannot leave the observed range")
      }
    }
  }

  test("q274: roles partition the points; clusters are consistent") {
    val rows = graft.SparkEntry.queries("q274_dbscan")(spark, Sf)
      .collect().map { r =>
        (r.getAs[Number](0).longValue(), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Number].longValue()))
      }
    assert(rows.nonEmpty)
    rows.foreach { case (_, role, cluster) =>
      role match {
        case "core" | "border" => assert(cluster.isDefined)
        case "noise"           => assert(cluster.isEmpty)
        case other             => fail(s"unknown role $other")
      }
    }
    // Every cluster id is itself a CORE point of that same cluster.
    val coreIds = rows.filter(_._2 == "core")
      .map(r => r._1 -> r._3.get).toMap
    rows.flatMap(_._3).distinct.foreach { cid =>
      assert(coreIds.get(cid).contains(cid),
        s"cluster id $cid must be the minimum core pid of its cluster")
    }
  }

  test("q274: grid reduction equals brute-force DBSCAN at sf0.001") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q274_dbscan")(spark, Sf)
      .collect().map { r =>
        (r.getAs[Number](0).longValue(), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Number].longValue()))
      }.toSet
    def coordLocal(salt: String, k: Long): Long =
      math.floorMod(graft.functions.Md5Hash.pack(
        (salt + k.toString).getBytes("UTF-8")), 10000L)
    val keys = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    val pts = keys.map(k => (k, coordLocal("pt_x_", k), coordLocal("pt_y_", k)))
    def within(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val (dx, dy) = (a._2 - b._2, a._3 - b._3)
      dx * dx + dy * dy <= 400L * 400L
    }
    val neigh = pts.map(p => p._1 -> pts.filter(q => within(p, q)).map(_._1))
      .toMap
    val core = pts.map(_._1).filter(p => neigh(p).length >= 4).toSet
    // Sequential union-find over core-core in-eps edges.
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (p <- core; q <- neigh(p) if core(q)) {
      val (rp, rq) = (find(p), find(q))
      if (rp != rq) parent(math.max(rp, rq)) = math.min(rp, rq)
    }
    val expect = pts.map { p =>
      val id = p._1
      if (core(id)) (id, "core", Some(find(id)))
      else {
        val coreNbrs = neigh(id).filter(core)
        if (coreNbrs.nonEmpty) (id, "border", Some(coreNbrs.map(find).min))
        else (id, "noise", None)
      }
    }.toSet
    assert(got === expect)
  }
}
