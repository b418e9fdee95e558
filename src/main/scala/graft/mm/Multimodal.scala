package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators (SURVEY.md §2.4).
  *
  * The Spark-side machinery — schemas, binaryFile-style records, partition
  * batching via mapPartitions, feature vectors — is real and tested; the
  * actual codec is STUBBED behind [[Codec]] with a deterministic fake,
  * because no image/audio libraries exist in this container. Swapping in a
  * real decoder is a one-function change with no plan changes.
  */
object Multimodal {

  /** A media record: opaque payload + source metadata (mirrors the schema of
    * Spark's built-in `binaryFile` source so real file ingestion is a
    * drop-in: spark.read.format("binaryFile").load(...)).
    */
  final case class MediaRecord(media_id: Long, media_type: String,
      n_bytes: Long, content: Array[Byte])

  /** Typed decode result: dimensions + a fixed-width feature vector. */
  final case class DecodedMedia(media_id: Long, media_type: String,
      width: Int, height: Int, channels: Int, features: Array[Float])

  /** A pluggable decoder working on one payload at a time; implementations
    * must be serializable (shipped to executors).
    */
  trait Codec extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): DecodedMedia.Partial
  }
  object DecodedMedia {
    final case class Partial(width: Int, height: Int, channels: Int,
        features: Array[Float])
  }

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF —
    * no external jars): dimensions and channel count from the decoded
    * raster, features = per-band pixel-value sums (a pooled feature
    * exact enough to oracle-check: integer-valued and < 2^24 for test
    * fixtures, so the Float carries it bit-exactly). Accumulation runs
    * in doubles; an unreadable payload fails loudly rather than
    * fabricating data.
    */
  object ImageIoCodec extends Codec {
    def decode(mediaType: String, bytes: Array[Byte]): DecodedMedia.Partial = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new UnsupportedOperationException(
          s"ImageIO has no reader for this '$mediaType' payload " +
            s"(${bytes.length} bytes)")
      val raster = img.getRaster
      val bands = raster.getNumBands
      val sums = new Array[Double](bands)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var b = 0
          while (b < bands) {
            sums(b) += raster.getSample(x, y, b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      DecodedMedia.Partial(img.getWidth, img.getHeight, bands,
        sums.map(_.toFloat))
    }
  }

  /** Real PCM audio decode via the JDK's `javax.sound.sampled` (WAV/AU
    * — no external jars): stream format from the parsed header, samples
    * decoded to 16-bit signed ints with the container's endianness.
    * Exact by construction, so an oracle can replay planted waveforms
    * bit-for-bit.
    */
  object WavCodec {
    /** Decoded PCM: interleaved frames (frame i, channel c at
      * `samples(i * channels + c)`).
      */
    final case class Pcm(channels: Int, sampleRateHz: Int, nFrames: Long,
        samples: Array[Int])

    def decode(bytes: Array[Byte]): Pcm = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getEncoding !=
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16)
        throw new UnsupportedOperationException(
          s"only 16-bit signed PCM is decoded here, got $fmt")
      val raw = ais.readAllBytes()
      val out = new Array[Int](raw.length / 2)
      val big = fmt.isBigEndian
      var i = 0
      while (i < out.length) {
        val (hi, lo) = if (big) (raw(2 * i), raw(2 * i + 1))
          else (raw(2 * i + 1), raw(2 * i))
        out(i) = (hi.toInt << 8) | (lo.toInt & 0xff)
        i += 1
      }
      Pcm(fmt.getChannels, fmt.getSampleRate.toInt,
        out.length / fmt.getChannels, out)
    }
  }

  /** Perceptual average-hash over REAL decoded pixels: the image is
    * pooled onto a grid×grid luma grid (cells by the exact integer map
    * `x*grid div w`), and a cell's bit is set iff its mean luma exceeds
    * the image mean — compared multiplicatively
    * (cellSum·totalCnt > totalSum·cellCnt) so the hash is integer-exact
    * and an oracle can replay it from a planted pixel formula without
    * any division rounding. Returns (width, height, hash) with bit
    * (cy·grid + cx). Luma = sum of the raster's bands (monotone in the
    * usual luminance weights — enough for a threshold hash).
    */
  def aHashFromImage(bytes: Array[Byte], grid: Int): (Int, Int, Long) = {
    require(grid * grid <= 63, s"grid $grid overflows the Long hash")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null)
      throw new UnsupportedOperationException(
        s"ImageIO has no reader for this payload (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val cellSum = new Array[Long](grid * grid)
    val cellCnt = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        var l = 0L
        var b = 0
        while (b < bands) { l += raster.getSample(x, y, b); b += 1 }
        val c = cy * grid + x * grid / w
        cellSum(c) += l
        cellCnt(c) += 1
        x += 1
      }
      y += 1
    }
    val totalSum = cellSum.sum
    val totalCnt = cellCnt.sum
    var hash = 0L
    var c = 0
    while (c < grid * grid) {
      if (cellCnt(c) > 0 &&
          cellSum(c) * totalCnt > totalSum * cellCnt(c)) hash |= 1L << c
      c += 1
    }
    (w, h, hash)
  }

  /** The real-codec dispatch: image payloads decode through
    * [[ImageIoCodec]], PCM audio through [[WavCodec]] (mapped into the
    * shared Partial shape: width = frames, height = 1, features =
    * per-channel mean absolute amplitude); media types with no codec in
    * this environment (video) fail loudly rather than fabricating data.
    */
  object RealCodec extends Codec {
    private val ImageExts = Set("png", "jpg", "jpeg", "bmp", "gif", "wbmp")
    private val AudioExts = Set("wav", "wave", "au")
    def decode(mediaType: String, bytes: Array[Byte]): DecodedMedia.Partial =
      if (mediaType.startsWith("image/") ||
          ImageExts(mediaType.stripPrefix("file/")))
        ImageIoCodec.decode(mediaType, bytes)
      else if (mediaType.startsWith("audio/") ||
          AudioExts(mediaType.stripPrefix("file/")))
        try {
          val pcm = WavCodec.decode(bytes)
          val sums = new Array[Double](pcm.channels)
          var i = 0
          while (i < pcm.samples.length) {
            sums(i % pcm.channels) += math.abs(pcm.samples(i).toDouble)
            i += 1
          }
          DecodedMedia.Partial(
            width = math.min(pcm.nFrames, Int.MaxValue.toLong).toInt,
            height = 1, channels = pcm.channels,
            features = sums.map(s =>
              (s / math.max(pcm.nFrames, 1L)).toFloat))
        } catch {
          case e: Exception =>
            throw new UnsupportedOperationException(
              s"payload is not decodable '$mediaType' audio: $e", e)
        }
      else
        throw new UnsupportedOperationException(
          s"no real codec for '$mediaType' in this environment; " +
            "use DeterministicFakeCodec or plug a codec jar in")
  }

  /** Deterministic fake: "dimensions" derived from payload length, features
    * = normalized 16-bin byte histogram. Stable across runs/partitionings,
    * so tests can assert exact values.
    */
  object DeterministicFakeCodec extends Codec {
    def decode(mediaType: String, bytes: Array[Byte]): DecodedMedia.Partial = {
      val hist = new Array[Float](16)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 4) += 1f
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      DecodedMedia.Partial(
        width = (bytes.length % 640) + 1,
        height = (bytes.length % 480) + 1,
        channels = 3,
        features = hist.map(_ / n))
    }
  }

  /** Real file ingestion: Spark's `binaryFile` source over a directory →
    * the same MediaRecord schema every downstream operator consumes.
    * media_id is the xxhash64 of the file path (stable across reruns);
    * media_type derives from the file extension. `pathGlobFilter` can
    * restrict to e.g. `*.png` at scan time.
    */
  def readBinaryDir(spark: SparkSession, dir: String,
      globFilter: Option[String] = None): Dataset[MediaRecord] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
    globFilter.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir).select(
      xxhash64(col("path")).as("media_id"),
      concat(lit("file/"),
        element_at(split(col("path"), "\\."), -1)).as("media_type"),
      col("length").as("n_bytes"),
      col("content"),
    ).as[MediaRecord]
  }

  /** Build a media table from the documents testdata: the text payload
    * stands in for an opaque media blob (real ingestion would use the
    * binaryFile source with the same downstream schema).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // A NULL payload has no media semantics and would NPE the codec batch;
    // rows without content are dropped at the boundary.
    docs.filter(col("text").isNotNull).select(
      col("doc_id").as("media_id"),
      concat(lit("image/fake-"), col("source")).as("media_type"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("content"),
    ).as[MediaRecord]
  }

  /** Distributed decode: batch-per-partition iteration (no per-row task
    * overhead, codec initialized once per partition — the Scala analogue of
    * a pandas-batched UDF). Partitioning of the input is preserved.
    */
  def decodeAll(media: Dataset[MediaRecord],
      codec: Codec = DeterministicFakeCodec): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val p = codec.decode(r.media_type, r.content)
        DecodedMedia(r.media_id, r.media_type, p.width, p.height, p.channels,
          p.features)
      }
    }
  }

  /** Frame sampling: split a payload into n byte-range "frames" — pure
    * Column expressions (binary substring), no decode needed. The last
    * frame takes the division remainder so the frames exactly cover the
    * payload. Output: one row per (media_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val frameLen = (col("n_bytes") / nFrames).cast("int")
    val lastLen = (col("n_bytes") - frameLen * (nFrames - 1)).cast("int")
    media
      .select(col("media_id"), col("content"), col("n_bytes"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        col("content").substr(
          (col("frame_idx") * frameLen + 1).cast("int"),
          when(col("frame_idx") === nFrames - 1, lastLen)
            .otherwise(frameLen)).as("frame_bytes"))
  }

  /** REAL nearest-neighbor resize over decoded pixels: decode through
    * ImageIO, sample source pixel (x2*w/ow, y2*h/oh) for every output
    * cell — the standard floor-mapped nearest-neighbor kernel — and
    * fold the resized raster into two integer-exact digests an oracle
    * can replay from a planted pixel formula: a position-weighted
    * checksum Σ (x2*31 + y2*17 + 1) * (r + 2g + 3b) and the plain
    * band-0 sum. All integer arithmetic, so the hash match proves the
    * resize sampled the true source pixels at the true positions.
    * Returns (srcWidth, srcHeight, checksum, sumBand0).
    */
  def resizeNearestFromImage(bytes: Array[Byte], outW: Int, outH: Int)
      : (Int, Int, Long, Long) = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null)
      throw new UnsupportedOperationException(
        s"ImageIO has no reader for this payload (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    var checksum = 0L
    var sum0 = 0L
    var y2 = 0
    while (y2 < outH) {
      val sy = y2 * h / outH
      var x2 = 0
      while (x2 < outW) {
        val sx = x2 * w / outW
        var weighted = 0L
        var b = 0
        while (b < bands) {
          val v = raster.getSample(sx, sy, b).toLong
          weighted += (b + 1) * v
          if (b == 0) sum0 += v
          b += 1
        }
        checksum += (x2 * 31L + y2 * 17L + 1L) * weighted
        x2 += 1
      }
      y2 += 1
    }
    (w, h, checksum, sum0)
  }

  /** Histogram equalization over a REAL decoded raster, integer-exact:
    * luminance `gray = (r + 2g + b) div 4` (0..255), a 16-bin histogram
    * (`bin = gray div 16`), and the classic CDF remap
    * `eq = (cdf(bin) − cdfMin) · 255 div (npx − cdfMin)` — every step
    * floor-division on non-negative integers, so the oracle can replay
    * the identical arithmetic from a planted pixel formula. Returns
    * (width, height, occupied-bin count, positional checksum
    * Σ (x·7 + y·13 + 1)·eq(x,y)). Degenerate single-bin images (npx ==
    * cdfMin) equalize to all-zero by convention, mirrored in the oracle.
    */
  def histEqualizeFromImage(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null)
      throw new UnsupportedOperationException(
        s"ImageIO has no reader for this payload (${bytes.length} bytes)")
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val bins = 16
    val hist = new Array[Long](bins)
    def grayAt(x: Int, y: Int): Int = {
      val r = raster.getSample(x, y, 0)
      val g = raster.getSample(x, y, 1)
      val b = raster.getSample(x, y, 2)
      (r + 2 * g + b) / 4
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { hist(grayAt(x, y) / bins) += 1L; x += 1 }
      y += 1
    }
    val cdf = new Array[Long](bins)
    var acc = 0L
    var i = 0
    var usedBins = 0L
    while (i < bins) {
      acc += hist(i)
      cdf(i) = acc
      if (hist(i) > 0) usedBins += 1
      i += 1
    }
    val npx = w.toLong * h
    var cdfMin = npx
    i = 0
    while (i < bins) {
      if (hist(i) > 0 && cdf(i) < cdfMin) cdfMin = cdf(i)
      i += 1
    }
    var checksum = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bin = grayAt(x, y) / bins
        val eq =
          if (npx > cdfMin) (cdf(bin) - cdfMin) * 255L / (npx - cdfMin)
          else 0L
        checksum += (x * 7L + y * 13L + 1L) * eq
        x += 1
      }
      y += 1
    }
    (w, h, usedBins, checksum)
  }

  /** Sobel edge extraction over a REAL decoded raster: luminance
    * `(r + 2g + b) div 4` (the m31 grayscale), 3×3 Sobel Gx/Gy on
    * interior pixels, magnitude `|Gx| + |Gy|` — integer-exact end to
    * end. Returns (width, height, edge_sum, n_strong ≥ 128, positional
    * checksum); images narrower than 3×3 have no interior and return
    * zeros.
    */
  def sobelFromImage(bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null)
      throw new UnsupportedOperationException(
        s"ImageIO has no reader for this payload (${bytes.length} bytes)")
    val raster = img.getRaster
    // a grayscale or palette-indexed decode yields <3 bands; getSample
    // on band 1/2 would throw ArrayIndexOutOfBounds — fail the same
    // loud way as an undecodable payload instead
    if (raster.getNumBands < 3)
      throw new UnsupportedOperationException(
        s"sobel expects an RGB raster, got ${raster.getNumBands} band(s)")
    val (w, h) = (img.getWidth, img.getHeight)
    def lum(x: Int, y: Int): Int = {
      val r = raster.getSample(x, y, 0)
      val g = raster.getSample(x, y, 1)
      val b = raster.getSample(x, y, 2)
      (r + 2 * g + b) / 4
    }
    var edgeSum = 0L
    var nStrong = 0L
    var checksum = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val gx = (lum(x + 1, y - 1) + 2 * lum(x + 1, y) + lum(x + 1, y + 1)) -
          (lum(x - 1, y - 1) + 2 * lum(x - 1, y) + lum(x - 1, y + 1))
        val gy = (lum(x - 1, y + 1) + 2 * lum(x, y + 1) + lum(x + 1, y + 1)) -
          (lum(x - 1, y - 1) + 2 * lum(x, y - 1) + lum(x + 1, y - 1))
        val mag = math.abs(gx).toLong + math.abs(gy).toLong
        edgeSum += mag
        if (mag >= 128L) nStrong += 1L
        checksum += (x * 7L + y * 13L + 1L) * mag
        x += 1
      }
      y += 1
    }
    (w, h, edgeSum, nStrong, checksum)
  }

  /** Deterministic "resize": integer-divide dimensions by `factor`
    * (floored at 1) and average-pool the feature vector in factor-sized
    * chunks — the metadata/feature side of a resize without a codec. A
    * real pixel resize plugs into [[Codec]]; every downstream schema stays
    * the same.
    */
  def resizeMeta(decoded: Dataset[DecodedMedia],
      factor: Int = 2): Dataset[DecodedMedia] = {
    require(factor >= 1, "resize factor must be >= 1")
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val pooled = d.features.grouped(factor)
        .map(g => g.sum / g.length).toArray
      d.copy(
        width = math.max(1, d.width / factor),
        height = math.max(1, d.height / factor),
        features = pooled)
    }
  }

  /** End-to-end: documents → media table → decoded features, as a DataFrame
    * for downstream SQL (e.g. similarity over the histogram features).
    */
  def decodedFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeAll(mediaFromDocuments(
      graft.queries.Tables.t(spark, dir, "documents"))).toDF()
}
