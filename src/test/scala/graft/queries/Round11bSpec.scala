package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 74's linkage and resize additions. */
class Round11bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d59: blocking never drops a true pair; full agreement = match") {
    val rows = graft.SparkEntry.queries("d59_fellegi_sunter")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getString(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // blocks are built on uncorrupted fields, so every diagonal pair
    // survives blocking: true pairs across patterns = customer count
    val nTrue = rows.map(_._7).sum
    val nCust = graft.queries.Tables.t(spark, Sf, "customer").count()
    assert(nTrue === nCust)
    // the top-score pattern is full agreement and classified match
    val top = rows.maxBy(_._4)
    assert((top._1, top._2, top._3) === ((1, 1, 1)))
    assert(top._5 === "match")
    // scores are monotone in the number of agreeing fields
    val byAgree = rows.groupBy(r => r._1 + r._2 + r._3)
      .map { case (k, v) => k -> v.map(_._4).max }
    byAgree.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((_, s1), (_, s2)) => assert(s1 < s2)
      case _ =>
    }
  }

  test("m30 kernel: identity resize checksums the full raster exactly") {
    // a 3x2 image with known pixels, resized to its own dimensions:
    // every source pixel sampled once at its own position
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var expected = 0L
    var sumR = 0L
    for (y <- 0 until 2; x <- 0 until 3) {
      val (r, g, b) = (10 * x + y, 20 * x + y, 30 * x + y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      expected += (x * 31L + y * 17L + 1L) * (r + 2L * g + 3L * b)
      sumR += r
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, checksum, s0) =
      graft.mm.Multimodal.resizeNearestFromImage(bos.toByteArray, 3, 2)
    assert((w, h) === ((3, 2)))
    assert(checksum === expected)
    assert(s0 === sumR)
    // downsample to 1x1 samples exactly the (0,0) pixel
    val (_, _, c1, s1) =
      graft.mm.Multimodal.resizeNearestFromImage(bos.toByteArray, 1, 1)
    assert(c1 === 0L + 1L * (0 + 0 + 0))
    assert(s1 === 0L)
  }

  test("m33 kernel: a grayscale raster fails loudly, not with an " +
      "ArrayIndexOutOfBounds from a missing band") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val e = intercept[UnsupportedOperationException] {
      graft.mm.Multimodal.sobelFromImage(bos.toByteArray)
    }
    assert(e.getMessage.contains("band"), e.getMessage)
  }
}
