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
}
