package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata; decode / feature-extraction /
 * resize / frame-sampling run as batched per-partition transforms.
 *
 * IMAGE decode is REAL: [[decodeImage]] header-sniffs any format the
 * JDK's javax.imageio ships readers for (PNG/JPEG/BMP/GIF/WBMP) —
 * width/height/format without decoding pixels — and
 * [[mapDecodePartitions]] uses it, falling back to the deterministic
 * hash stub for payloads no reader recognizes. AUDIO (WAV) decode is
 * real via the hand-rolled [[decodeWav]] RIFF parser, and animated-GIF
 * FRAME structure is real via [[decodeGifFrames]] +
 * [[mapFrameSamplePartitions]] — the closest thing to video frame
 * sampling the JDK can do natively. True video codecs and pixel-level
 * features remain STUBS in this container (no media libraries):
 * `decodeStub`/`extractFeaturesStub`/`frameSampleStub`
 * derive deterministic fakes from the payload hash. Everything around
 * them — schema, null handling, partition-parallel batch shape, column
 * pruning — is real Spark plumbing: swap in a JNI or vectorized decoder
 * without touching the plan.
 */
object Multimodal {

  /** Real image header decode via the JDK's ImageIO: (width, height,
    * lowercase format name), or None when no installed reader claims the
    * bytes. Reads ONLY the header — no pixel decode, so the per-row cost
    * is microseconds and independent of image size. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.length == 0) return None
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => None // truncated/corrupt header -> stub fallback
    } finally iis.close()
  }

  /** Deterministic REAL PNG payloads for fixture oracles: per row, a
    * (id%7+3) x (id%5+2) image with id-derived pixels is encoded with
    * ImageIO on the executor — so a downstream [[mapDecodePartitions]]
    * must recover exactly those dimensions via the real decoder, and an
    * engine-independent oracle can recompute them as arithmetic on the
    * id. Appends binary `outCol`; `idCol` must be long-typed. */
  def syntheticPngs(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val w = (id % 7 + 3).toInt
        val h = (id % 5 + 2).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 31 + x * 7 + y) % 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Full PIXEL decode via JDK ImageIO (PNG/BMP/GIF lossless; JPEG
    * decodes but is lossy upstream): (width, height, per-channel RGB
    * sums) — the real feature-extraction step (mean color, luminance,
    * brightness filters) behind the multimodal schema, not just the
    * header sniff of [[decodeImage]]. Returns None for anything the JDK
    * can't decode, so callers can fall back to the documented stub. */
  def decodePixelStats(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] = {
    if (bytes == null || bytes.length == 0) return None
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = img.getRGB(x, y)
            sr += (v >> 16) & 0xff
            sg += (v >> 8) & 0xff
            sb += v & 0xff
            x += 1
          }
          y += 1
        }
        Some((w, h, sr, sg, sb))
      }
    } catch { case _: Exception => None }
  }

  private val pixelStatsType = StructType(Seq(
    StructField("w", org.apache.spark.sql.types.IntegerType),
    StructField("h", org.apache.spark.sql.types.IntegerType),
    StructField("sum_r", org.apache.spark.sql.types.LongType),
    StructField("sum_g", org.apache.spark.sql.types.LongType),
    StructField("sum_b", org.apache.spark.sql.types.LongType)))

  /** Batched pixel-stats extraction over a binary column: appends a
    * `pix` struct (w, h, sum_r, sum_g, sum_b), null when the payload
    * doesn't decode. Same batched mapPartitions shape as
    * [[mapDecodePartitions]] — the plumbing a codec swap rides on. */
  def mapPixelStatsPartitions(df: DataFrame, contentCol: String,
                              batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("pix", pixelStatsType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val pix = decodePixelStats(row.getAs[Array[Byte]](contentIdx)) match {
            case Some((w, h, sr, sg, sb)) => Row(w, h, sr, sg, sb)
            case None => null
          }
          Row.fromSeq(row.toSeq :+ pix)
        }
      }
    }(enc)
  }

  /** Real WAV (RIFF/WAVE) header decode with NO library at all: walks
    * the chunk list (word-aligned), reads the fmt chunk's little-endian
    * fields and sizes frames off the data chunk — (sampleRate, channels,
    * bitsPerSample, nFrames), or None for anything that isn't a
    * well-formed RIFF/WAVE. Independent of the JDK writer that produces
    * the fixtures, so the round-trip is a cross-implementation check. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    def u32(i: Int): Long = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
    var dataLen = -1L
    while (pos + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(pos)
      val sz = u32(pos + 4)
      if (id == "fmt " && pos + 8 + 16 <= bytes.length)
        fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 20), u16(pos + 22)))
      else if (id == "data")
        dataLen = math.min(sz, (bytes.length - pos - 8).toLong)
      pos += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
    }
    fmt.flatMap { case (ch, rate, block, bits) =>
      if (dataLen < 0 || block <= 0 || ch <= 0 || rate <= 0) None
      else Some((rate, ch, bits, dataLen / block))
    }
  }

  /** REAL image feature extraction: a joint RGB color histogram
    * (bins³ dims, bin width 256/bins) over the decoded pixels — the
    * classical content-based-retrieval embedding (histogram cosine is
    * the pre-deep-learning image similarity). Deterministic integer
    * counts, engine-replayable. Returns None when the payload doesn't
    * decode. */
  def imageColorHistogram(bytes: Array[Byte], bins: Int = 4)
      : Option[Array[Long]] = {
    require(bins >= 1 && 256 % bins == 0, "bins must divide 256")
    if (bytes == null || bytes.length == 0) return None
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val width = 256 / bins
        val hist = new Array[Long](bins * bins * bins)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val v = img.getRGB(x, y)
            val r = ((v >> 16) & 0xff) / width
            val g = ((v >> 8) & 0xff) / width
            val b = (v & 0xff) / width
            hist((r * bins + g) * bins + b) += 1L
            x += 1
          }
          y += 1
        }
        Some(hist)
      }
    } catch { case _: Exception => None }
  }

  /** Batched histogram-feature extraction: appends a nullable
    * array<long> `features` column (the image-embedding shape real
    * featurizers drop into). */
  def mapHistogramFeaturesPartitions(df: DataFrame, contentCol: String,
                                     bins: Int = 4,
                                     batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("features",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val f = imageColorHistogram(row.getAs[Array[Byte]](contentIdx), bins)
            .orNull
          Row.fromSeq(row.toSeq :+ f)
        }
      }
    }(enc)
  }

  /** Perceptual difference hash (dHash) — THE classical image near-dup
    * fingerprint: decode, floor-map to a 9×8 luminance grid (sx =
    * x·w div 9, sy = y·h div 8 — deterministic, engine-replayable; up-
    * AND down-scaling by the same rule), one bit per horizontally
    * adjacent pair (left < right). Integer luminance 299r+587g+114b
    * (no division — comparisons are scale-invariant). The 64-bit
    * output plugs straight into [[Dedup.fingerprintDupPairs]]'s
    * banding for image near-dup joins. */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null || bytes.length == 0) return None
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        def lum(gx: Int, gy: Int): Long = {
          val v = img.getRGB(gx * w / 9, gy * h / 8)
          299L * ((v >> 16) & 0xff) + 587L * ((v >> 8) & 0xff) + 114L * (v & 0xff)
        }
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (lum(x, y) < lum(x + 1, y)) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }
  }

  /** 2-D Walsh–Hadamard image embedding: decode, floor-map to a
    * grid×grid luminance field (same 299r+587g+114b integer luminance
    * and gx·w/grid source mapping as [[imageDHash]]), then the first
    * order×order sequency coefficients
    * c_(u,v) = Σ L(gx,gy)·σ(gx,u)·σ(gy,v), σ = ±1 by popcount parity.
    * The ±1-only transform keeps the embedding exact integers — a real
    * image featurizer (low-sequency structure ≈ the DCT block an
    * aHash/pHash uses) that an independent engine replays bit-for-bit.
    * Flat index k = u·order + v. */
  def imageWht(bytes: Array[Byte], grid: Int = 8,
               order: Int = 4): Option[Array[Long]] = {
    if (bytes == null || bytes.length == 0) return None
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Long](order * order)
        var gy = 0
        while (gy < grid) {
          var gx = 0
          while (gx < grid) {
            val v = img.getRGB(gx * w / grid, gy * h / grid)
            val lum = 299L * ((v >> 16) & 0xff) + 587L * ((v >> 8) & 0xff) +
              114L * (v & 0xff)
            var u = 0
            while (u < order) {
              val su = if (java.lang.Integer.bitCount(gx & u) % 2 == 0) 1 else -1
              var vv = 0
              while (vv < order) {
                val sv = if (java.lang.Integer.bitCount(gy & vv) % 2 == 0) su
                         else -su
                out(u * order + vv) += sv * lum
                vv += 1
              }
              u += 1
            }
            gx += 1
          }
          gy += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }
  }

  /** Batched 2-D WHT embedding extraction: appends `iwht` array<long>,
    * null when the payload doesn't decode. */
  def mapImageWhtPartitions(df: DataFrame, contentCol: String, grid: Int = 8,
                            order: Int = 4, batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("iwht", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val e = imageWht(row.getAs[Array[Byte]](contentIdx), grid, order)
            .orNull
          Row.fromSeq(row.toSeq :+ e)
        }
      }
    }(enc)
  }

  /** Batched dHash extraction: appends a nullable long `dhash`. */
  def mapDHashPartitions(df: DataFrame, contentCol: String,
                         batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("dhash", org.apache.spark.sql.types.LongType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val d: java.lang.Long =
            imageDHash(row.getAs[Array[Byte]](contentIdx))
              .map(java.lang.Long.valueOf).orNull
          Row.fromSeq(row.toSeq :+ d)
        }
      }
    }(enc)
  }

  /** REAL image resize: decode, nearest-neighbor downscale so the long
    * side fits `maxSide` (floor source mapping `sx = x·w div nw` — OUR
    * arithmetic, not a library resampler, so results are deterministic
    * and engine-replayable), and report the resized image's dims +
    * per-channel sums. Upscaling never happens (already-small images
    * pass through). Returns (w, h, newW, newH, sum_r, sum_g, sum_b). */
  def resizePixelStats(bytes: Array[Byte], maxSide: Int)
      : Option[(Int, Int, Int, Int, Long, Long, Long)] = {
    require(maxSide >= 1, "maxSide must be >= 1")
    if (bytes == null || bytes.length == 0) return None
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val m = math.max(w, h)
        val (nw, nh) =
          if (m <= maxSide) (w, h)
          else (math.max(1, w * maxSide / m), math.max(1, h * maxSide / m))
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < nh) {
          val sy = y * h / nh
          var x = 0
          while (x < nw) {
            val v = img.getRGB(x * w / nw, sy)
            sr += (v >> 16) & 0xff
            sg += (v >> 8) & 0xff
            sb += v & 0xff
            x += 1
          }
          y += 1
        }
        Some((w, h, nw, nh, sr, sg, sb))
      }
    } catch { case _: Exception => None }
  }

  private val resizeStatsType = StructType(Seq(
    StructField("w", org.apache.spark.sql.types.IntegerType),
    StructField("h", org.apache.spark.sql.types.IntegerType),
    StructField("new_w", org.apache.spark.sql.types.IntegerType),
    StructField("new_h", org.apache.spark.sql.types.IntegerType),
    StructField("sum_r", org.apache.spark.sql.types.LongType),
    StructField("sum_g", org.apache.spark.sql.types.LongType),
    StructField("sum_b", org.apache.spark.sql.types.LongType)))

  /** Batched real-resize stats: appends a `rsz` struct, null when the
    * payload doesn't decode. */
  def mapResizeStatsPartitions(df: DataFrame, contentCol: String,
                               maxSide: Int,
                               batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("rsz", resizeStatsType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val rsz = resizePixelStats(row.getAs[Array[Byte]](contentIdx), maxSide) match {
            case Some((w, h, nw, nh, sr, sg, sb)) => Row(w, h, nw, nh, sr, sg, sb)
            case None => null
          }
          Row.fromSeq(row.toSeq :+ rsz)
        }
      }
    }(enc)
  }

  /** Full SAMPLE decode for 16-bit PCM WAV: (rate, channels, frames,
    * Σ samples, Σ |samples|) — the loudness/DC-offset feature extraction
    * step behind the audio schema, the PCM twin of [[decodePixelStats]].
    * Walks the RIFF chunk list like [[decodeWav]] but reads the data
    * chunk's little-endian signed samples; None for anything that isn't
    * well-formed 16-bit PCM. */
  def decodeWavSamples(bytes: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    wavPcm(bytes).map { case (rate, ch, frames, dataPos, nSamples) =>
      var sum = 0L; var sumAbs = 0L
      var k = 0
      while (k < nSamples) {
        val s = (bytes(dataPos + 2 * k + 1) << 8) | (bytes(dataPos + 2 * k) & 0xff)
        sum += s
        sumAbs += math.abs(s)
        k += 1
      }
      (rate, ch, frames, sum, sumAbs)
    }

  /** Shared RIFF walk for the 16-bit-PCM decoders:
    * (rate, channels, frames, data offset, sample count) or None for
    * anything that isn't well-formed 16-bit PCM. */
  private def wavPcm(bytes: Array[Byte])
      : Option[(Int, Int, Long, Int, Int)] = {
    if (bytes == null || bytes.length < 44) return None
    def u32(i: Int): Long = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataPos = -1
    var dataLen = -1L
    while (pos + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(pos)
      val sz = u32(pos + 4)
      if (id == "fmt " && pos + 8 + 16 <= bytes.length)
        fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 20), u16(pos + 22)))
      else if (id == "data") {
        dataPos = pos + 8
        dataLen = math.min(sz, (bytes.length - pos - 8).toLong)
      }
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    val dp = dataPos
    fmt.flatMap { case (ch, rate, block, bits) =>
      if (dataLen < 0 || block <= 0 || ch <= 0 || rate <= 0 || bits != 16) None
      else Some((rate, ch, dataLen / block, dp, (dataLen / 2).toInt))
    }
  }

  /** First `order` Walsh–Hadamard coefficients over the first `win`
    * decoded samples (zero-padded past the data): c_k = Σ_n s[n]·σ(n,k)
    * with σ = ±1 by parity of popcount(n AND k) — sequency-domain audio
    * features (the ±1-only transform) in EXACT integer arithmetic, so
    * unlike an FFT the feature vector is bit-replayable by an
    * independent engine. */
  def decodeWavWht(bytes: Array[Byte], win: Int = 32,
                   order: Int = 8): Option[Array[Long]] =
    wavPcm(bytes).map { case (_, _, _, dataPos, nSamples) =>
      val out = new Array[Long](order)
      val n = math.min(win, nSamples)
      var i = 0
      while (i < n) {
        val s = (bytes(dataPos + 2 * i + 1) << 8) | (bytes(dataPos + 2 * i) & 0xff)
        var k = 0
        while (k < order) {
          out(k) += (if (java.lang.Integer.bitCount(i & k) % 2 == 0) s
                     else -s)
          k += 1
        }
        i += 1
      }
      out
    }

  /** Batched WHT feature extraction: appends `wht` array<long>, null
    * when the payload is not decodable PCM. */
  def mapWavWhtPartitions(df: DataFrame, contentCol: String, win: Int = 32,
                          order: Int = 8, batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("wht", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val wht = decodeWavWht(row.getAs[Array[Byte]](contentIdx), win, order)
            .orNull
          Row.fromSeq(row.toSeq :+ wht)
        }
      }
    }(enc)
  }

  private val wavStatsType = StructType(Seq(
    StructField("rate", org.apache.spark.sql.types.IntegerType),
    StructField("channels", org.apache.spark.sql.types.IntegerType),
    StructField("frames", org.apache.spark.sql.types.LongType),
    StructField("sum_s", org.apache.spark.sql.types.LongType),
    StructField("sum_abs", org.apache.spark.sql.types.LongType)))

  /** Batched PCM sample-stats extraction: appends a `pcm` struct
    * (rate, channels, frames, sum_s, sum_abs), null when the payload
    * isn't decodable 16-bit PCM. */
  def mapWavSampleStatsPartitions(df: DataFrame, contentCol: String,
                                  batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("pcm", wavStatsType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val pcm = decodeWavSamples(row.getAs[Array[Byte]](contentIdx)) match {
            case Some((rate, ch, fr, s, sa)) => Row(rate, ch, fr, s, sa)
            case None => null
          }
          Row.fromSeq(row.toSeq :+ pcm)
        }
      }
    }(enc)
  }

  /** Deterministic REAL PCM-WAV payloads for fixture oracles: per row a
    * 16-bit file with id-derived rate/channels/frames/samples, written
    * by the JDK's javax.sound (an INDEPENDENT writer from [[decodeWav]]'s
    * hand-rolled parser). `idCol` must be long-typed. */
  def syntheticWavs(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val rate = (8000 + (id % 4) * 4000).toInt
        val ch = (id % 2 + 1).toInt
        val frames = (id % 50 + 10).toInt
        val pcm = new Array[Byte](frames * 2 * ch)
        var i = 0
        while (i < pcm.length) {
          pcm(i) = ((id * 131 + i * 17) % 256 - 128).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch,
          true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  /** Real animated-GIF frame-structure decode via the JDK's ImageIO GIF
    * reader: per-frame (width, height) for EVERY image in the file, or
    * None when the bytes are not a GIF any installed reader claims.
    * Walks frame descriptors only — no pixel decode. */
  def decodeGifFrames(bytes: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    if (bytes == null || bytes.length < 6) return None
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      var out: Option[IndexedSeq[(Int, Int)]] = None
      while (out.isEmpty && readers.hasNext) {
        val r = readers.next()
        try {
          if (r.getFormatName.toLowerCase(java.util.Locale.ROOT) == "gif") {
            r.setInput(iis, false, false) // random access: allow frame search
            val n = r.getNumImages(true)
            // a bare magic with no image descriptors "reads" as 0 frames —
            // that is garbage, not an animation
            if (n > 0)
              out = Some((0 until n).map(i => (r.getWidth(i), r.getHeight(i))))
          }
        } catch {
          case _: Exception => // truncated/corrupt -> keep None
        } finally r.dispose()
      }
      out
    } finally iis.close()
  }

  /** Deterministic REAL animated GIFs for fixture oracles: per row an
    * (id%6+2)-frame animation of (id%7+3) x (id%5+2) frames with
    * id-derived pixels, written by ImageIO's sequence writer on the
    * executor — so [[mapFrameSamplePartitions]] must recover exactly
    * that frame structure through the real reader, and an
    * engine-independent oracle recomputes it as id arithmetic.
    * `idCol` must be long-typed. */
  def syntheticGifs(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(idIdx)
        val w = (id % 7 + 3).toInt
        val h = (id % 5 + 2).toInt
        val nFrames = (id % 6 + 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, ((id * 37 + f * 101 + x * 7 + y) % 0xffffff).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally {
          writer.dispose(); ios.close()
        }
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }(enc)
  }

  val frameType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType), StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Batched per-partition FRAME sampling: GIF payloads get the real
    * [[decodeGifFrames]] structure walk and every `everyN`th frame's
    * (idx, width, height) is emitted; unrecognized bytes fall back to
    * the deterministic hash stub (same count formula as
    * [[frameSampleStub]]). Appends a `frames` array column for a
    * downstream `explode` — the 1→N shape a real video sampler uses. */
  def mapFrameSamplePartitions(df: DataFrame, contentCol: String,
                               everyN: Int = 1, batchSize: Int = 256): DataFrame = {
    require(everyN >= 1)
    val schema = StructType(df.schema.fields :+
      StructField("frames", ArrayType(frameType, containsNull = false)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val frames = decodeGifFrames(bytes) match {
            case Some(dims) =>
              (0 until dims.length by everyN)
                .map { i => val (w, h) = dims(i); Row(i, w, h) }
            case None =>
              val hh = if (bytes == null) 0L
                else graft.functions.TextHashing.bytesHash(bytes, 0, bytes.length, 11L)
              val n = math.floorMod(hh, 64).toInt + 1
              (0 until n by everyN).map { i =>
                Row(i, (math.floorMod(hh >>> 3, 1920) + 32).toInt,
                  (math.floorMod(hh >>> 23, 1080) + 32).toInt)
              }
          }
          Row.fromSeq(row.toSeq :+ frames)
        }
      }
    }(enc)
  }

  val audioMetaType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits", IntegerType), StructField("n_frames", LongType),
    StructField("codec", StringType)))

  /** Batched per-partition AUDIO decode: WAV payloads get the real
    * [[decodeWav]] header parse; unrecognized bytes fall back to a
    * deterministic hash stub (same contract as the image path). Appends
    * an `audio_meta` struct. */
  def mapAudioDecodePartitions(df: DataFrame, contentCol: String,
                               batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio_meta", audioMetaType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val meta = decodeWav(bytes) match {
            case Some((rate, ch, bits, frames)) =>
              Row(rate, ch, bits, frames, "pcm_wav")
            case None =>
              val h = if (bytes == null) 0L
                else graft.functions.TextHashing.bytesHash(bytes, 0, bytes.length, 9L)
              Row((math.floorMod(h, 4) * 8000 + 8000).toInt,
                (math.floorMod(h >>> 7, 2) + 1).toInt, 16,
                math.floorMod(h >>> 17, 100000),
                Seq("mp3", "opus", "flac")(math.floorMod(h, 3).toInt))
          }
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }(enc)
  }

  val mediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))

  /** Deterministic fake "decode": width/height/format derived from the
    * payload hash. STUB — replace with a real codec at deployment. */
  def decodeStub(content: Column): Column = {
    val h = xxhash64(content)
    struct(
      (pmod(h, lit(1920)) + 32).cast("int").as("width"),
      (pmod(shiftrightunsigned(h, 13), lit(1080)) + 32).cast("int").as("height"),
      when(pmod(h, lit(3)) === 0, "jpeg").when(pmod(h, lit(3)) === 1, "png")
        .otherwise("webp").as("format"))
  }

  /** Deterministic fake feature vector (dim floats in [0,1)) from the
    * payload — the plumbing (fixed-dim array<float> schema, codegen'd
    * per-row transform) is what a real embedding UDF would use. STUB. */
  def extractFeaturesStub(content: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(content, i), lit(100000)) / lit(100000.0)).cast("float"))

  /** "Resize": with a real codec this re-encodes pixels; the stub keeps
    * the payload and rewrites metadata, preserving aspect ratio. */
  def resizeStub(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = lit(maxSide) / greatest(w, h)
    struct(
      when(scale < 1, floor(w * scale)).otherwise(w).cast("int").as("width"),
      when(scale < 1, floor(h * scale)).otherwise(h).cast("int").as("height"),
      meta.getField("format").as("format"))
  }

  /** "Frame sampling": with a real codec this decodes every `everyN`th
    * video frame; the stub derives a deterministic frame count from the
    * payload hash and emits (frame_idx, frame_hash) structs. The 1→N
    * array-building + downstream `explode` plumbing is what a real
    * sampler uses. STUB. */
  def frameSampleStub(content: Column, everyN: Int): Column = {
    require(everyN >= 1)
    val frameCount = (pmod(xxhash64(content, lit(99)), lit(64)) + 1).cast("int")
    transform(
      sequence(lit(0), frameCount - 1, lit(everyN)),
      i => struct(i.as("frame_idx"), xxhash64(content, i).as("frame_hash")))
  }

  /**
   * Batched per-partition decode path — the Scala analog of a pandas
   * mapInPandas UDF: one iterator pass per partition, batching amortizes
   * per-batch codec setup. Output schema: input columns + meta struct.
   * Payloads a JDK ImageIO reader recognizes get a REAL header decode
   * ([[decodeImage]]); anything else falls back to the deterministic
   * hash stub, so non-image fixtures keep their previous metadata.
   */
  def mapDecodePartitions(df: DataFrame, contentCol: String,
                          batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", mediaMetaType))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch "codec init" would go here
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](contentIdx)
          val meta = decodeImage(bytes) match {
            case Some((w, h, fmt)) => Row(w, h, fmt)
            case None =>
              val h = if (bytes == null) 0L
                else graft.functions.TextHashing.bytesHash(bytes, 0, bytes.length, 7L)
              Row((math.floorMod(h, 1920) + 32).toInt,
                (math.floorMod(h >>> 13, 1080) + 32).toInt,
                Seq("jpeg", "png", "webp")(math.floorMod(h, 3).toInt))
          }
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }(enc)
  }
}
