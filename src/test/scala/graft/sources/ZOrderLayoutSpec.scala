package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

/** The end-to-end layout payoff: a z-ordered file layout queried
  * through the fixed-width source's own zone-map skipping.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("z-order layout makes SECONDARY-column predicates prune files") {
    // the same 64x64 grid written as 16 fixed-width files under two
    // layouts. A z-ordered layout turns each file into a 16x16 tile,
    // so a predicate on y alone excludes 12 of 16 files; a linear
    // (x, y) sort gives x-stripes whose y envelopes are all full-range
    // — nothing prunes.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val spec = "x:long:4,y:long:4"
    val schema = FixedWidth.parseSchema(spec)
    def writeLayout(key: ((Long, Long)) => Long): String = {
      val dir = java.nio.file.Files.createTempDirectory("fwlayout")
      grid.groupBy(key).foreach { case (bucket, rows) =>
        val path = dir.resolve(f"part_$bucket%02d.fw")
        val bytes = FixedWidthWriter.render(schema,
          rows.map { case (x, y) => Seq[Any](x, y) })
        java.nio.file.Files.write(path, bytes)
        FwStats.write(FwStats.sidecarFor(path.toString), Map(
          "x" -> FwIntStats(rows.map(_._1).min, rows.map(_._1).max),
          "y" -> FwIntStats(rows.map(_._2).min, rows.map(_._2).max)),
          bytes.length.toLong)
      }
      dir.toString
    }
    val zDir = writeLayout { case (x, y) =>
      ZOrder.z2Ref(x.toInt, y.toInt) / 256 } // 16 contiguous curve tiles
    val linDir = writeLayout { case (x, _) => x / 4 } // 16 x-stripes
    def scan(dir: String): (Long, Int) = {
      val n = spark.read.format("graft.sources.FixedWidth")
        .option("schema", spec).load(dir)
        .filter(col("y") >= 0L && col("y") <= 7L).count()
      (n, FixedWidth.lastSkippedFiles)
    }
    val (nz, skippedZ) = scan(zDir)
    val (nl, skippedL) = scan(linDir)
    assert(nz === 512L && nl === 512L, "both layouts return the same rows")
    assert(skippedZ === 12,
      s"z tiles bound y: 12 of 16 files must prune, got $skippedZ")
    assert(skippedL === 0,
      s"x-stripes cannot bound y, got $skippedL pruned")
  }
}
