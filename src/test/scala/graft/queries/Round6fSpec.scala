package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q151/s15 batch: the partitioned writer lays
  * out prunable year directories, and diversity means replay from
  * sequential pairwise cosines.
  */
class Round6fSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q151: writer lays out one directory per year; read-back prunes") {
    val rows = q("q151_partitioned_write").collect()
    assert(rows.length === 5)
    val scratch = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_q151", "sf0.001")
    val dirs = scratch.toFile.listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("o_year=")))
    // the pruned read-back only touches the 1995 directory: its row
    // count must replay from the source table
    val n1995 = Tables.t(spark, Sf, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(rows.map(_.getLong(1)).sum === n1995)
    // pruning is structural: every file the filtered scan touches lives
    // under the 1995 partition directory
    val touched = spark.read.parquet(scratch.toString)
      .filter(col("o_year") === 1995)
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(touched.nonEmpty)
    assert(touched.forall(_.contains("o_year=1995")),
      s"scan touched non-1995 files: ${touched.filterNot(_.contains("o_year=1995")).mkString(",")}")
  }

  test("s15: per-label means replay from sequential pairwise cosines") {
    val rows = q("s15_embed_diversity").collect()
    assert(rows.nonEmpty)
    val embs = Tables.t(spark, Sf, "embeddings")
      .filter(col("vec_id") < 100)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(x: Array[Double], y: Array[Double]) = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) { d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i) }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    rows.foreach { r =>
      val label = r.getInt(0)
      val mem = embs.filter(_._2 == label).sortBy(_._1)
      val cosines = for {
        i <- mem.indices; j <- (i + 1) until mem.length
      } yield BigDecimal(cos(mem(i)._3, mem(j)._3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getLong(1) === cosines.length.toLong)
      val mean = (cosines.sum / cosines.length).toDouble
      assert(math.abs(r.getDouble(2) - mean) < 1e-5,
        s"label $label mean ${r.getDouble(2)} vs sequential $mean")
      assert(r.getDouble(2) > -1.0 && r.getDouble(2) < 1.0)
    }
  }
}
