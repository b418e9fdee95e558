package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct pins for the shared LSH pair-expansion helper — cap edges and
  * pair ordering, which d4/d5 exercise only indirectly.
  */
class BucketedPairsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def pairsOf(rows: Seq[(String, Long)], maxBucket: Int) = {
    import spark.implicits._
    BucketedPairs.pairs(rows.toDF("b", "id"), Seq("b"), col("id"), maxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("all unordered pairs within a bucket, x < y, none across buckets") {
    val got = pairsOf(Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L), ("b", 8L)), 10)
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (8L, 9L)))
  }

  test("singleton buckets produce nothing") {
    assert(pairsOf(Seq(("a", 1L), ("b", 2L), ("c", 3L)), 10) === Set.empty)
  }

  test("bucket at exactly maxBucket is kept; maxBucket+1 is dropped whole") {
    val atCap = (1L to 4L).map(i => ("a", i))
    val overCap = (1L to 5L).map(i => ("b", i + 10))
    val got = pairsOf(atCap ++ overCap, 4)
    // 4-member bucket -> C(4,2)=6 pairs; 5-member bucket -> dropped
    assert(got.size === 6)
    assert(got.forall { case (x, y) => x < y && y <= 4 })
  }

  test("duplicate members pair deterministically (sorted member array)") {
    val got = pairsOf(Seq(("a", 2L), ("a", 2L), ("a", 1L)), 10)
    // sorted members [1,2,2] -> (1,2), (1,2), (2,2); set-collapsed here
    assert(got === Set((1L, 2L), (2L, 2L)))
  }
}
