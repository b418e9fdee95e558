package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins GramAgg against the declarative explode-pairs formulation it
  * replaces, across multiple map partitions (exercising update AND
  * merge AND serialize), and checks the flat-index layout contract.
  */
class GramMatrixSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("matches the explode-groupBy reference across partitions") {
    import spark.implicits._
    val dim = 5
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(97)(Array.fill(dim)(rnd.nextInt(2001) - 1000L))
    // reference: plain dense double loop
    val cells = dim * (dim + 1) / 2
    val want = new Array[Long](cells)
    vecs.foreach { q =>
      var pos = 0
      for (i <- 0 until dim; j <- i until dim) {
        want(pos) += q(i) * q(j); pos += 1
      }
    }
    val got = vecs.toDF("qv").repartition(7)
      .agg(GramMatrix.gram(col("qv"), dim).as("g"))
      .collect().head.getSeq[Long](0)
    assert(got.toArray.toSeq === want.toSeq)
  }

  test("flat index layout is the row-major upper triangle") {
    import spark.implicits._
    val dim = 3
    // single one-hot-pair vector isolates each cell
    val v = Array(2L, 3L, 5L)
    val g = Seq(v).toDF("qv")
      .agg(GramMatrix.gram(col("qv"), dim).as("g"))
      .collect().head.getSeq[Long](0)
    // expected order: (0,0)(0,1)(0,2)(1,1)(1,2)(2,2)
    assert(g === Seq(4L, 6L, 10L, 9L, 15L, 25L))
  }

  test("dimension mismatch fails loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(Array(1L, 2L)).toDF("qv")
        .agg(GramMatrix.gram(col("qv"), 3))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("empty input yields the zero triangle") {
    import spark.implicits._
    val g = Seq.empty[Array[Long]].toDF("qv")
      .agg(GramMatrix.gram(col("qv"), 4).as("g"))
      .collect().head.getSeq[Long](0)
    assert(g.length === 10 && g.forall(_ == 0L))
  }
}
