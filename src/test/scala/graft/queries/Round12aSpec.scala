package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Handcrafted-fixture pins for the round-8 operators — cases the
  * sf0.01 oracle sweep may not isolate.
  */
class Round12aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("d61: overlapping duplicate anchors merge into ONE character " +
      "span; disjoint self-repeats stay separate islands") {
    import spark.implicits._
    val dir = Files.createTempDirectory("d61fix").toFile.getAbsolutePath
    // S: 44 distinct chars. docA holds all of it; docB duplicates
    // chars 1..25, docC duplicates chars 20..44 — docA's two duplicated
    // position runs are DISJOINT (1..6 and 20..25) but their character
    // intervals overlap, so the interval union must emit ONE 44-char
    // span (a plain run-merge would report two overlapping spans and
    // double-count chars 20..25).
    val s = ('a' to 'z').mkString + ('A' to 'R').mkString
    assert(s.length === 44)
    val docA = s
    val docB = s.substring(0, 25) + "0000000000"
    val docC = "11111" + s.substring(19)
    // docD: a 20-char block repeated with a 5-char gap — a SELF-repeat
    // within one document counts, and the two islands stay separate
    // (positions 1 and 26; char intervals [1,20] and [26,45] touch
    // nothing)
    val b = ('a' to 't').mkString.reverse
    val docD = b + "#####" + b
    val docE = "no repeats here at all: 12345xy"
    Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD), (5L, docE))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = TextOps78.queries("d61_exact_substring_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1L, 1L, 44L, 44L), // one merged span over the whole of S
      (4L, 2L, 40L, 20L), // two separate 20-char self-repeat islands
      (2L, 1L, 25L, 25L),
      (3L, 1L, 25L, 25L)))
    val corpus = TextOps78
      .queries("d61_exact_substring_spans")(spark, dir)
      .select("docs_with_dups", "total_spans", "total_dup_chars",
        "total_docs", "total_chars", "retained_chars")
      .head()
    val totalChars =
      Seq(docA, docB, docC, docD, docE).map(_.length.toLong).sum
    assert(corpus.getLong(0) === 4L)
    assert(corpus.getLong(1) === 5L)
    assert(corpus.getLong(2) === 134L)
    assert(corpus.getLong(3) === 5L)
    assert(corpus.getLong(4) === totalChars)
    assert(corpus.getLong(5) === totalChars - 134L)
  }

  test("q372: degree-ordered wedge join counts each triangle exactly " +
      "once on a known graph") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q372fix").toFile.getAbsolutePath
    // baskets {1,2,3} and {1,2,4}: K4 minus edge (3,4) — exactly the
    // triangles {1,2,3} and {1,2,4}, 5 edges, 4 nodes
    Seq((10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = Analytics143.queries("q372_triangle_count")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq === Seq(
      (1L, 2L, 6L, 2L, 5L, 4L),
      (2L, 2L, 6L, 2L, 5L, 4L),
      (3L, 1L, 6L, 2L, 5L, 4L),
      (4L, 1L, 6L, 2L, 5L, 4L)))
  }
}
