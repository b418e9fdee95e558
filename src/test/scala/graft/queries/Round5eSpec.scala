package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the s9/t24/d23/q107 batch: the projection kernel
  * agrees bit-for-bit with the HOF fold, the JL witness is honest, the
  * readability formula replays on the driver, canonical URLs are truly
  * canonical, and the KMV intersection estimate lands near the exact.
  */
class Round5eSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("ProjectVec matches the zip_with/aggregate fold bit-for-bit") {
    val planes = Array.tabulate(4, 64)((k, j) =>
      if ((k * 31 + j * 7) % 3 == 0) 1.0 else -1.0)
    val e = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull).limit(25)
      .select(graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
    val hof = array((0 until 4).map(k => graft.functions.VectorOps.dot(
      col("emb"), typedlit(planes(k).toSeq))): _*)
    val rows = e.select(
      graft.functions.GraftFunctions.projectVec(col("emb"), planes).as("pv"),
      hof.as("ref")).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1),
        "codegen'd projection diverged from the HOF fold")
    }
    // null vector → null projection (nullSafeEval path)
    val n = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS emb")
      .select(graft.functions.GraftFunctions.projectVec(col("emb"), planes))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("s9: pair grid complete, distortion honest and JL-concentrated") {
    val rows = q("s9_random_projection").collect()
    val nProbes = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull && col("vec_id") % 25 === 0).count()
    assert(rows.length.toLong === nProbes * (nProbes - 1) / 2)
    rows.foreach { r =>
      val (orig, proj, dist) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(orig > 0 && proj >= 0)
      // distortion column is the rounded quotient of the two others
      assert(math.abs(dist - proj / orig) < 1e-4, s"pair ${r.getLong(0)}")
      // k=16 keeps individual pair distortion within loose JL tails
      assert(dist > 0.05 && dist < 5.0, s"distortion $dist out of range")
    }
    val mean = rows.map(_.getDouble(4)).sum / rows.length
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean biased")
  }

  test("s9: driver-side exact distance replay for the first pair") {
    val rows = q("s9_random_projection").collect()
    val first = rows.head
    val emb = Tables.t(spark, Sf, "embeddings")
      .filter(col("vec_id").isin(first.getLong(0), first.getLong(1)))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val (a, b) = (emb(first.getLong(0)), emb(first.getLong(1)))
    val d2 = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(math.abs(first.getDouble(2) - d2) < 1e-5,
      s"driver recompute ${d2} vs engine ${first.getDouble(2)}")
  }

  test("t24: formula replays on the driver; bands follow the thresholds") {
    val rows = q("t24_readability").collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val (w, syl, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w > 0)
      val score = 206.835 - 1.015 * (w.toDouble / math.max(s, 1L)) -
        84.6 * (syl.toDouble / w)
      assert(math.abs(r.getDouble(4) - score) < 1e-3,
        s"doc ${r.getLong(0)} flesch")
      val band = if (r.getDouble(4) >= 60) "easy"
        else if (r.getDouble(4) >= 30) "medium" else "hard"
      assert(r.getString(5) === band)
    }
  }

  test("d23: groups partition the corpus; canonical forms are canonical") {
    val rows = q("d23_url_canonical").collect()
    val total = Tables.t(spark, Sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val canon = r.getString(0)
      assert(!canon.contains("://") && !canon.startsWith("www."))
      assert(!canon.contains("?") && !canon.endsWith("/"))
      assert(canon.startsWith("ex"), canon)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1),
        "variant count outside [1, n_docs]")
    }
  }

  test("q107: exacts replay; sketch estimates land near them") {
    val row = q("q107_kmv_intersect").collect().head
    val a = Tables.t(spark, Sf, "orders")
      .select(col("o_custkey").as("key")).distinct()
    val b = Tables.t(spark, Sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key")).distinct()
    val exactU = a.unionByName(b).distinct().count()
    val exactI = a.join(b, Seq("key"), "left_semi").count()
    assert(row.getLong(0) === exactU)
    assert(row.getLong(2) === exactI)
    // k=128 on a ~150-key union: the sketch covers most of the set, so
    // both estimates should sit well within 25%
    assert(math.abs(row.getDouble(1) - exactU) / exactU < 0.25,
      s"est_union ${row.getDouble(1)} vs $exactU")
    assert(math.abs(row.getDouble(3) - exactI) / math.max(exactI, 1L) < 0.35,
      s"est_intersect ${row.getDouble(3)} vs $exactI")
    val j = row.getDouble(4)
    assert(j >= 0.0 && j <= 1.0)
  }

  test("s9/t24/d23 plan shapes: map-only kernels, no shuffle joins") {
    def plan(n: String) = q(n).queryExecution.executedPlan.toString
    assert(plan("s9_random_projection").contains("project_vec"),
      "s9 lost the codegen'd projection kernel")
    assert(!plan("s9_random_projection").contains("SortMergeJoin"))
    // t24 is a pure row-local map + output sort: no aggregate exchange
    assert(!plan("t24_readability").contains("HashAggregate"))
    assert(!plan("d23_url_canonical").contains("SortMergeJoin"))
  }
}
