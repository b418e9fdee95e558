package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.mm.Multimodal

/** Property tests for the non-SQL-expressible operators (SimHash, ANN-LSH,
  * multimodal decode) — these back the rows-only driver checks.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("SimHash: identical docs distance 0; near docs close; disjoint docs far") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val far = (100 to 160).map(i => s"other$i").mkString(" ")
    val df = docsDF(Seq((1L, base), (2L, base), (3L, near), (4L, far)))
    val sigs = SimHash.signatures(df, "doc_id", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) === sigs(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 3L) < 12, s"near doc too far: ${ham(1L, 3L)}")
    assert(ham(1L, 4L) > 16, s"disjoint doc too close: ${ham(1L, 4L)}")

    val pairs = SimHash.nearDuplicates(df, "doc_id", split(col("text"), " "),
        maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("SimHashOf per-row fold equals the declarative aggregate formulation") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val fast = SimHash.signatures(docs, "doc_id", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = SimHash.signaturesDeclarative(docs, "doc_id", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === ref)
    assert(fast.size === 500)
  }

  test("ANN-LSH: planted near-duplicates are found as top-1 neighbors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val bases = (0 until 20).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))
    }
    // id+100 = tiny perturbation of id → should be its top neighbor.
    val dups = bases.map { case (id, v) =>
      (id + 100, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val vecs = (bases ++ dups).toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 20)
    val top = AnnLsh.topK(vecs, probes, "vec_id", "embedding",
        k = 1, numPlanes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = (0 until 20).count(i =>
      top.get(i.toLong).contains(i + 100L)) / 20.0
    assert(recall >= 0.8, s"planted-duplicate recall too low: $recall")
  }

  test("ANN-IVF: planted near-duplicates found; deterministic across runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val bases = (0 until 20).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))
    }
    val dups = bases.map { case (id, v) =>
      (id + 100, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val vecs = (bases ++ dups).toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 20)
    def run() = AnnIvf.topK(vecs, probes, "vec_id", "embedding",
        k = 1, nCentroids = 8, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top = run()
    val recall = (0 until 20).count(i =>
      top.get(i.toLong).contains(i + 100L)) / 20.0
    assert(recall >= 0.8, s"planted-duplicate recall too low: $recall")
    assert(run() === top)
  }

  test("ANN-LSH bucketize is deterministic and stable across repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val b1 = AnnLsh.bucketize(vecs, "vec_id", "embedding", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = AnnLsh.bucketize(vecs.repartition(7), "vec_id", "embedding", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
  }

  test("ANN-LSH bucketize tolerates a NULL embedding in the first row") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (null.asInstanceOf[Array[Float]] +:
      Seq.fill(5)(Array.fill(8)(rnd.nextGaussian().toFloat)))
      .zipWithIndex.map { case (e, i) => (i.toLong, e) }
    // single partition keeps the NULL row first for the head(1) sniff
    val vecs = rows.toDF("vec_id", "embedding").coalesce(1)
    val b = AnnLsh.bucketize(vecs, "vec_id", "embedding", 4).collect()
    assert(b.nonEmpty) // no NPE; non-null rows bucketized
  }

  test("ANN-LSH bucketize of an all-NULL-embedding corpus is empty, not a crash") {
    import spark.implicits._
    val vecs = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    assert(AnnLsh.bucketize(vecs, "vec_id", "embedding", 4).count() === 0L)
  }

  test("VectorOps: cosine(v, v) = 1, cosine orthogonal = 0") {
    import spark.implicits._
    val df = Seq((Array(1f, 0f, 2f), Array(1f, 0f, 2f), Array(0f, 3f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine(col("a"), col("b")).as("same"),
      VectorOps.cosine(col("a"), col("c")).as("orth")).first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("Multimodal: decode is deterministic, partition-independent; frames cover payload") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.mediaFromDocuments(docs)
    val d1 = Multimodal.decodeAll(media).collect()
      .map(d => d.media_id -> (d.width, d.height, d.features.toSeq)).toMap
    val d2 = Multimodal.decodeAll(media.repartition(11)).collect()
      .map(d => d.media_id -> (d.width, d.height, d.features.toSeq)).toMap
    assert(d1 === d2)
    assert(d1.values.forall { case (_, _, f) =>
      f.length == 16 && math.abs(f.sum - 1.0) < 1e-3 })

    val frames = Multimodal.sampleFrames(media.toDF(), 4)
    val counts = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .select("n").distinct().collect().map(_.getLong(0)).toSeq
    assert(counts === Seq(4L))
    // Frames exactly reassemble each payload (last frame takes remainder).
    val reassembled = frames.orderBy("media_id", "frame_idx")
      .groupBy("media_id")
      .agg(sum(octet_length(col("frame_bytes"))).as("total"))
    val mismatch = reassembled
      .join(media.toDF().select(col("media_id"), col("n_bytes")), "media_id")
      .filter(col("total") =!= col("n_bytes")).count()
    assert(mismatch === 0)

    intercept[UnsupportedOperationException] {
      Multimodal.RealCodec.decode("image/png", Array[Byte](1, 2))
    }
  }

  test("Multimodal: ImageIoCodec decodes real PNGs to exact pixels") {
    // a 3x2 RGB image with known channel values: the decode must return
    // the true raster (dims, band count, per-band sums), not metadata
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sr = 0; var sg = 0; var sb = 0
    for (y <- 0 until 2; x <- 0 until 3) {
      val (r, g, b) = (10 * x + y, 100 + x, 200 + y)
      sr += r; sg += g; sb += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val p = Multimodal.ImageIoCodec.decode("image/png", bos.toByteArray)
    assert((p.width, p.height, p.channels) === ((3, 2, 3)))
    assert(p.features.toSeq === Seq(sr.toFloat, sg.toFloat, sb.toFloat))
    // RealCodec dispatches image payloads to the real decoder...
    val viaReal = Multimodal.RealCodec.decode("file/png", bos.toByteArray)
    assert((viaReal.width, viaReal.height, viaReal.channels)
      === ((p.width, p.height, p.channels)))
    assert(viaReal.features.toSeq === p.features.toSeq)
    // ...and still fails loudly where no codec exists in this container
    intercept[UnsupportedOperationException] {
      Multimodal.RealCodec.decode("audio/wav", bos.toByteArray)
    }
  }

  test("Multimodal: WavCodec round-trips 16-bit PCM through a WAV container") {
    val samples = Array[Int](0, 1000, -1000, 32767, -32768, 12345, -1)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val pcm = Multimodal.WavCodec.decode(bos.toByteArray)
    assert((pcm.channels, pcm.sampleRateHz, pcm.nFrames) === ((1, 8000, 7L)))
    assert(pcm.samples.toSeq === samples.toSeq,
      "decoded samples must be bit-exact, including the int16 extremes")
    // RealCodec maps audio into the shared Partial shape
    val p = Multimodal.RealCodec.decode("audio/wav", bos.toByteArray)
    assert((p.width, p.height, p.channels) === ((7, 1, 1)))
    val meanAbs = samples.map(s => math.abs(s.toDouble)).sum / 7
    assert(math.abs(p.features(0) - meanAbs) < 1e-3)
  }

  test("Multimodal: binaryFile source ingests real files into the media schema") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.wav"), Array[Byte](9, 8, 7))
    Files.write(dir.resolve("skip.txt"), Array[Byte](0))
    val all = Multimodal.readBinaryDir(spark, dir.toString).collect()
      .map(m => m.media_type -> m.n_bytes).toSet
    assert(all === Set("file/png" -> 4L, "file/wav" -> 3L, "file/txt" -> 1L))
    val pngOnly = Multimodal
      .readBinaryDir(spark, dir.toString, globFilter = Some("*.png"))
    assert(pngOnly.collect().map(_.media_type).toSeq === Seq("file/png"))
    // downstream decode runs unchanged on the real-file records
    val dec = Multimodal.decodeAll(pngOnly).collect()
    assert(dec.head.features.length === 16)
  }

  test("Multimodal: resizeMeta halves dims (floored at 1) and average-pools features") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val dec = Multimodal.decodeAll(Multimodal.mediaFromDocuments(docs))
    val orig = dec.collect().map(d => d.media_id -> d).toMap
    val resized = Multimodal.resizeMeta(dec, factor = 2).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.width === math.max(1, o.width / 2))
      assert(r.height === math.max(1, o.height / 2))
      assert(r.features.length === o.features.length / 2)
      r.features.zipWithIndex.foreach { case (f, i) =>
        assert(math.abs(f - (o.features(2 * i) + o.features(2 * i + 1)) / 2) < 1e-6f)
      }
    }
  }

  test("AnnPq: reconstruction picks the argmin codeword per subspace") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 8
    val rows = (0L until 40L).map(id =>
      (id, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("vec_id", "emb")
    val cb = AnnPq.codebook(df, "vec_id", "emb", 4)
    assert(cb.length === 4 && cb.forall(_.length === dim))
    val m = 4
    val sub = dim / m
    val got = AnnPq.withReconstruction(df, "emb", cb, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toArray).toMap
    rows.foreach { case (id, v) =>
      val want = (0 until m).flatMap { mi =>
        val vs = v.slice(mi * sub, (mi + 1) * sub)
        val best = cb.zipWithIndex.minBy { case (cw, ki) =>
          val cs = cw.slice(mi * sub, (mi + 1) * sub)
          val d = vs.zip(cs).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, ki)
        }._1.slice(mi * sub, (mi + 1) * sub)
        best
      }.toArray
      assert(got(id).sameElements(want), s"vec $id reconstruction diverged")
    }
  }

  test("ColumnProfiler: hostile column names (quotes/backticks) profile cleanly") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (2L, null))
      .toDF("it's`bad`", "plain")
    val prof = ColumnProfiler.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet === Set("it's`bad`", "plain"))
    assert(prof("it's`bad`").getLong(1) === 0L)   // n_nulls
    assert(prof("it's`bad`").getLong(2) === 2L)   // n_distinct
    assert(prof("plain").getLong(1) === 1L)
    assert(prof("plain").getString(5) === "a")    // str_min
  }

  test("ColumnProfiler: empty schema is rejected with a clear message") {
    val empty = spark.emptyDataFrame
    val e = intercept[IllegalArgumentException](ColumnProfiler.profile(empty))
    assert(e.getMessage.contains("no columns"))
  }
}
