package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential test of the scan→filter→groupBy→agg core: 120
  * generated query specs run through the DataFrame API and through a
  * naive Scala fold over the collected rows. Complements the fixed DuckDB
  * oracle with combinatorial coverage of predicate/grouping/aggregate
  * interaction (null handling, empty groups, boundary comparisons).
  */
class FuzzAggSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private case class Spec(qtyOp: String, qtyBound: Double,
      flagEq: Option[String], grouping: Seq[String])

  private val genSpec = for {
    op <- Gen.oneOf("<", "<=", ">", ">=", "==", "!=")
    bound <- Gen.choose(0, 55).map(_.toDouble)
    flag <- Gen.option(Gen.oneOf("A", "N", "R", "Z")) // Z never occurs
    grouping <- Gen.oneOf(Seq.empty[String], Seq("l_returnflag"),
      Seq("l_linestatus"), Seq("l_returnflag", "l_linestatus"))
  } yield Spec(op, bound, flag, grouping)

  private def cmp(op: String, v: Double, b: Double): Boolean = op match {
    case "<" => v < b
    case "<=" => v <= b
    case ">" => v > b
    case ">=" => v >= b
    case "==" => v == b
    case "!=" => v != b
  }

  test("random filter+groupBy+agg specs agree with a naive Scala fold") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val rows = li.collect() // 6k rows at sf0.001
    val specs = Gen.listOfN(120, genSpec)
      .apply(Gen.Parameters.default, Seed(99L)).get

    specs.zipWithIndex.foreach { case (s, i) =>
      val pred = {
        val q = col("l_quantity")
        val base = s.qtyOp match {
          case "<" => q < s.qtyBound
          case "<=" => q <= s.qtyBound
          case ">" => q > s.qtyBound
          case ">=" => q >= s.qtyBound
          case "==" => q === s.qtyBound
          case "!=" => q =!= s.qtyBound
        }
        s.flagEq.map(f => base && col("l_returnflag") === f).getOrElse(base)
      }
      val aggs = Seq(count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sq"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
      val got = (if (s.grouping.isEmpty) li.filter(pred).agg(aggs.head, aggs.tail: _*)
        else li.filter(pred).groupBy(s.grouping.map(col): _*)
          .agg(aggs.head, aggs.tail: _*))
        .collect()
        .map { r =>
          val key = s.grouping.indices.map(r.getString).mkString("|")
          key -> (r.getLong(s.grouping.size),
            Option(r.get(s.grouping.size + 1)).map(_.toString.toDouble),
            Option(r.get(s.grouping.size + 2)).map(_.toString.toDouble),
            Option(r.get(s.grouping.size + 3)).map(_.toString.toDouble))
        }.toMap

      def keep(r: Row): Boolean = {
        val v = r.getDouble(2)
        cmp(s.qtyOp, v, s.qtyBound) &&
          s.flagEq.forall(_ == r.getString(0))
      }
      val kept = rows.filter(keep)
      val expected = kept
        .groupBy(r => s.grouping.map {
          case "l_returnflag" => r.getString(0)
          case "l_linestatus" => r.getString(1)
        }.mkString("|"))
        .map { case (k, rs) =>
          k -> (rs.length.toLong,
            Some(rs.map(_.getDouble(2)).sum),
            Some(rs.map(_.getDouble(3)).min),
            Some(rs.map(_.getDouble(3)).max))
        }

      if (kept.isEmpty && s.grouping.isEmpty) {
        // global agg over empty input: count 0, null sum/min/max
        assert(got.values.head._1 === 0L, s"spec $i: $s")
        assert(got.values.head._2.isEmpty, s"spec $i: $s")
      } else {
        assert(got.keySet === expected.keySet, s"spec $i: $s")
        expected.foreach { case (k, (n, sq, mn, mx)) =>
          val (gn, gsq, gmn, gmx) = got(k)
          assert(gn === n, s"spec $i count: $s key=$k")
          assert(math.abs(gsq.get - sq.get) < 1e-6, s"spec $i sum: $s key=$k")
          assert(gmn.get === mn.get, s"spec $i min: $s key=$k")
          assert(gmx.get === mx.get, s"spec $i max: $s key=$k")
        }
      }
    }
  }
}
