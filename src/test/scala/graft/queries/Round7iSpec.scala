package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pin for q189: the recursive walk visits every part
  * exactly once and depths match the digit-truncation taxonomy.
  */
class Round7iSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q189: roots partition the part table; depths are log10-bounded") {
    val rows = graft.SparkEntry.queries("q189_recursive_hierarchy")(
      spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = Tables.t(spark, Sf, "part").count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (root, _, maxDepth) =>
      assert(root >= 0 && root <= 9)
      assert(maxDepth <= 6, s"root $root depth $maxDepth")
    }
  }
}
