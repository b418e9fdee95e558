package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Batch 72 pin: the incremental SCD2 merge equals the full rebuild
  * row-for-row (the oracle proves it cross-engine; this proves it
  * within the engine, including column order and types).
  */
class Round8bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q221 incremental == q203 rebuild, exactly") {
    val inc = graft.SparkEntry.queries("q221_scd2_incremental")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val full = graft.SparkEntry.queries("q203_scd2_priority")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(inc.length == full.length)
    assert(inc == full)
  }
}
