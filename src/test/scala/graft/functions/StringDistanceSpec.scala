package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the full (unrestricted) Damerau–Levenshtein expression: known
  * vectors that separate it from both plain Levenshtein and the
  * restricted OSA variant, metric axioms over random strings, and
  * codegen/interpreted agreement through a real DataFrame.
  */
class StringDistanceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def dl(a: String, b: String): Int =
    StringDistance.damerau(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("known vectors, including the OSA-separating case") {
    assert(dl("", "") === 0)
    assert(dl("abc", "") === 3)
    assert(dl("", "abc") === 3)
    assert(dl("kitten", "sitting") === 3) // pure lev, no transposition
    assert(dl("martha", "marhta") === 1) // one adjacent transposition
    assert(dl("abcd", "acbd") === 1)
    // THE unrestricted-vs-OSA separator: OSA forbids edits inside a
    // transposed pair and answers 3; full DL transposes then inserts
    assert(dl("ca", "abc") === 2)
    assert(dl("ifhs", "fish") === 2) // two disjoint transpositions
  }

  test("metric axioms and lev dominance on random strings") {
    val rnd = new scala.util.Random(42)
    def randStr(): String =
      Array.fill(rnd.nextInt(9))(('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 300) {
      val (s, t, u) = (randStr(), randStr(), randStr())
      assert(dl(s, s) === 0)
      assert(dl(s, t) === dl(t, s), s"symmetry failed on '$s' '$t'")
      assert(dl(s, t) <= lev(s, t), s"DL must not exceed lev on '$s' '$t'")
      assert(dl(s, t) >= math.abs(s.length - t.length))
      assert(dl(s, u) <= dl(s, t) + dl(t, u),
        s"triangle failed on '$s' '$t' '$u'")
      if (dl(s, t) == 0) assert(s === t)
    }
  }

  test("DataFrame (codegen) path agrees with direct eval") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randStr(): String =
      Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = Seq.fill(200)((randStr(), randStr()))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        StringDistance.damerauLevenshtein(col("a"), col("b")).as("d"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2)))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === dl(a, b), s"codegen mismatch on '$a' '$b'")
    }
  }

  test("non-ASCII falls back to the boxed path with the same answers") {
    assert(dl("αβγ", "αγβ") === 1) // transposition, Greek
    assert(dl("cä", "äbc") === 2) // the OSA separator with an umlaut
    assert(dl("naïve", "naive") === 1)
    // mixed ASCII/non-ASCII pairs agree with the ASCII fast path on
    // their ASCII skeletons
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 100) {
      val a = Array.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Array.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString
      // force boxed by appending the same non-ASCII char to both
      assert(dl(a + "é", b + "é") === dl(a, b),
        s"suffix invariance failed on '$a' '$b'")
    }
  }

  test("damerau_levenshtein is SQL-callable after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT damerau_levenshtein('ca', 'abc') AS d").collect()
    assert(r.head.getInt(0) === 2)
  }

  test("nulls propagate") {
    import spark.implicits._
    val out = Seq((Option("ab"), Option.empty[String]))
      .toDF("a", "b")
      .select(StringDistance.damerauLevenshtein(col("a"), col("b")))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
