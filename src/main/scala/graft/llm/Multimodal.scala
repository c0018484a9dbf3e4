package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) rides through the
  * pipeline as an opaque `binary` column plus a typed metadata struct; decode
  * and feature extraction run batch-wise per partition so a real decoder
  * (JNI/native image lib) amortizes setup per partition, not per row.
  *
  * IMAGE decode is REAL: [[withImagePayload]] writes genuine PNG bytes
  * (`javax.imageio`, JVM-builtin — no native libs needed) and
  * [[decodeImage]] decodes them and features the actual pixels, falling
  * back to byte-level pseudo-features only for undecodable payloads.
  * AUDIO decode is REAL too: [[withAudioPayload]] writes genuine RIFF/WAV
  * 16-bit PCM files (`javax.sound.sampled`, also JVM-builtin) and
  * [[decodeAudio]] parses the container and features the actual decoded
  * samples, with the same degrade-don't-fail fallback.
  * VIDEO is real at the CONTAINER level and, for MJPEG, at the CODEC
  * level: [[withVideoPayload]] writes an actual RIFF/AVI bytestream
  * (headers, `movi` chunk list, `idx1` index) whose frames are either
  * lossless PNG (fourcc `MPNG` — what lets the DuckDB oracle state exact
  * pixels) or real ImageIO-encoded JPEG (fourcc `MJPG` — the real-world
  * compressed codec, decodable with the JVM-builtin JPEG reader; its
  * oracle asserts the codec-independent columns exactly and a spec pins
  * pixel fidelity, since JPEG is lossy). H.264 stays out of scope — no
  * JVM builtin. [[decodeVideo]] genuinely demuxes the container and
  * decodes sampled frames through per-codec cached readers dispatched on
  * the payload magic. `frameSampleStub` remains as the byte-stream
  * pseudo-sampler the raw-payload row exercises.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** javax.sound provider tables resolved ONCE per executor JVM.
    * `AudioSystem.write`/`getAudioInputStream` route every call through the
    * JDK's provider registry, whose lookup is globally SYNCHRONIZED
    * (`JDK13Services.getProviders`) — so 32 task threads serialize on one
    * lock at ~60–150 µs per row, and the audio row's wall time becomes
    * rows × lookup-cost regardless of parallelism (measured: 29.9 s → the
    * per-row loop cost at 10×; the micro-benchmark without the registry is
    * 3–15 µs/row). The provider OBJECTS are stateless and thread-safe; only
    * the registry is contended. Resolving them once and calling them
    * directly leaves the decode work byte-identical (same JDK provider
    * classes — pinned by the oracle row) and removes the lock from the
    * per-row path.
    */
  private lazy val audioFileWriters: Array[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private lazy val audioFileReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Attach a media payload to each document. Here the "image" is the UTF-8
    * text bytes (deterministic stand-in for a real binary column read from
    * parquet); metadata is derived from payload size like a real decoder
    * header probe would.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        lit("raw").as("format"),
        (length(col("media")) % 64 + 1).cast("int").as("width"),
        (length(col("media")) % 48 + 1).cast("int").as("height")))

  /** Stubbed per-batch decode + feature extraction: one pass over each
    * partition's rows, emitting (doc_id, n_bytes, head_byte, checksum,
    * features[4]). A real implementation swaps the body of `extract` for the
    * native decoder; the Spark-side contract (binary in, fixed-width feature
    * vector out, partition-batched) is the production shape.
    */
  def decodeStub(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    def extract(bytes: Array[Byte]): (Int, Int, Long, Array[Long]) = {
      // STUB: deterministic pseudo-decode. Real code: decode image, resize,
      // pool channels into the fixed-width feature vector. Features are
      // byte-class counts (integers) so the oracle compare is exact.
      val n = bytes.length
      val head = if (n > 0) bytes(0) & 0xff else 0
      var checksum = 0L
      val hist = new Array[Long](4)
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        checksum += b
        hist(b % 4) += 1L
        i += 1
      }
      (n, head, checksum, hist)
    }
    in.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (n, head, checksum, feats) = extract(bytes)
        (id, n, head, checksum, feats)
      }
    }.toDF("doc_id", "n_bytes", "head_byte", "checksum", "features")
  }

  /** Video-style frame sampling over the opaque payload: the byte stream is
    * treated as fixed-size frames, every `every`-th frame is kept, and the
    * sampled frames feed the (stubbed) decoder. Same partition-batched
    * contract as `decodeStub` — a real implementation replaces the body with
    * the container demuxer + keyframe seek; the Spark-side shape (binary in,
    * per-doc sample stats + head-frame digest out) is the production one.
    */
  def frameSampleStub(withMedia: DataFrame, frameBytes: Int = 32,
                      every: Int = 3): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // per partition
      rows.map { case (id, bytes) =>
        val n = bytes.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        val sampled = 0 until nFrames by every
        val sampledBytes = sampled.iterator
          .map(i => math.min(frameBytes, n - i * frameBytes).toLong).sum
        md.reset()
        val md5hex = md.digest(bytes.slice(0, math.min(frameBytes, n)))
          .map("%02x".format(_)).mkString
        (id, nFrames.toLong, sampled.size.toLong, sampledBytes, md5hex)
      }
    }.toDF("doc_id", "n_frames", "n_sampled", "sampled_bytes", "head_frame_md5")
  }

  /** Image-style resize over the opaque payload: the byte stream is read as
    * a `media_meta.width`-pixel-wide grayscale grid and box-filtered down to
    * `outW`×`outH` (integer mean per box — deterministic, no float filter
    * kernels). Same partition-batched contract as [[decodeStub]]; a real
    * implementation swaps the body for the native resampler. Output: the
    * resized pixel grid flattened row-major, plus its mean, so a downstream
    * fixed-shape tensor column is `pixels` directly.
    */
  def resizeStub(withMedia: DataFrame, outW: Int = 4, outH: Int = 4): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte], Int, Int)] = withMedia
      .select(col("doc_id"), col("media"),
        col("media_meta.width"), col("media_meta.height"))
      .as[(Long, Array[Byte], Int, Int)]
    in.mapPartitions { rows =>
      rows.map { case (id, bytes, w, _) =>
        val h = math.max(1, (bytes.length + w - 1) / w) // rows actually present
        val out = new Array[Long](outW * outH)
        var oy = 0
        while (oy < outH) {
          var ox = 0
          while (ox < outW) {
            // source box [y0,y1) x [x0,x1), proportional split (ceil-start)
            val y0 = oy * h / outH; val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
            val x0 = ox * w / outW; val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
            var sum = 0L; var cnt = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val idx = y * w + x
                if (idx < bytes.length) { sum += bytes(idx) & 0xff; cnt += 1 }
                x += 1
              }
              y += 1
            }
            out(oy * outW + ox) = if (cnt == 0) 0L else sum / cnt
            ox += 1
          }
          oy += 1
        }
        (id, out.toSeq, out.sum.toDouble / out.length)
      }
    }.toDF("doc_id", "pixels", "mean_px")
  }

  /** Attach a REAL PNG payload to each document: the document's UTF-8 bytes
    * tiled row-major into a `w`×`h` 8-bit grayscale grid (zero-padded to
    * fill the last row, `w = len % 13 + 3`) and PNG-encoded with
    * `javax.imageio` — an actual image file in a binary column, not a
    * pseudo-payload. Runs partition-batched like every decode here;
    * `ImageIO` ships with the JVM, so this needs no native libs. The pixel
    * grid being a pure function of the text is what lets the DuckDB oracle
    * state the expected decode output without a PNG decoder of its own.
    */
  def withImagePayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = docs
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory, no tmp spill
      rows.map { case (id, bytes) =>
        val n = bytes.length
        val w = n % 13 + 3
        val h = math.max(1, (n + w - 1) / w)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0, if (i < n) bytes(i) & 0xff else 0)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream(n + 256)
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray, w, h)
      }
    }.toDF("doc_id", "media", "width", "height")
      .withColumn("media_meta", struct(
        lit("png").as("format"), col("width"), col("height")))
      .drop("width", "height")
  }

  /** REAL image decode behind the same partition-batched binary-in /
    * features-out contract as [[decodeStub]]: `javax.imageio.ImageIO.read`
    * decodes each payload (PNG/BMP/JPEG — whatever the JVM's readers
    * handle), and the features come from the ACTUAL decoded pixels — the
    * raster dimensions, the gray-value sum, and a 4-bin brightness
    * histogram (64-wide bins). `decoded = 1` marks a successful decode; an
    * undecodable payload falls back to the byte-level pseudo-features
    * (`decoded = 0`, dims 0×0), so a corrupt file degrades instead of
    * failing the batch — the honest no-decoder path [[decodeStub]] always
    * took, now only for the rows that need it.
    */
  def decodeImage(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        // NonFatal, not just IOException: ImageIO's format parsers throw
        // IllegalArgumentException / NegativeArraySizeException on malformed
        // headers, and the degrade-don't-fail contract must hold for those
        // too — a corrupt payload must never kill the batch
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          // normalize band 0 to 8 bits: a 16-bit grayscale sample would
          // otherwise index past the 4-bin histogram (and skew the sum);
          // the clamp is belt-and-braces for exotic sample models
          val bits = raster.getSampleModel.getSampleSize(0)
          val shift = math.max(0, bits - 8)
          var sum = 0L
          val hist = new Array[Long](4)
          // per-pixel cost is the whole operator at corpus scale (decode is
          // linear CPU), so the sample loop avoids the per-call sample-model
          // arithmetic of raster.getSample: the common 8-bit single-band
          // interleaved layout (every grayscale PNG ImageIO produces) reads
          // the backing byte array directly; anything else takes a bulk
          // per-ROW getSamples (still one virtual call per row, not per
          // pixel). Both paths compute identical features — the oracle rows
          // and LlmOpsSpec pin that.
          raster.getSampleModel match {
            case p: java.awt.image.PixelInterleavedSampleModel
                if p.getNumBands == 1 && bits == 8 && p.getPixelStride == 1 &&
                  raster.getSampleModelTranslateX == 0 &&
                  raster.getSampleModelTranslateY == 0 &&
                  raster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] =>
              val db = raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte]
              val data = db.getData
              val stride = p.getScanlineStride
              val base = db.getOffset + p.getOffset(0, 0)
              var y = 0
              while (y < h) {
                var i = base + y * stride
                val end = i + w
                while (i < end) {
                  val px = data(i) & 0xff
                  sum += px
                  hist(px >> 6) += 1L
                  i += 1
                }
                y += 1
              }
            case _ =>
              val row = new Array[Int](w)
              var y = 0
              while (y < h) {
                raster.getSamples(0, y, w, 1, 0, row)
                var x = 0
                while (x < w) {
                  val px = math.min(255, row(x) >>> shift)
                  sum += px
                  hist(px >> 6) += 1L
                  x += 1
                }
                y += 1
              }
          }
          (id, 1L, w.toLong, h.toLong, sum, hist(0), hist(1), hist(2), hist(3))
        } else {
          var sum = 0L
          val hist = new Array[Long](4)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            sum += b
            hist(b / 64) += 1L
            i += 1
          }
          (id, 0L, 0L, 0L, sum, hist(0), hist(1), hist(2), hist(3))
        }
      }
    }.toDF("doc_id", "decoded", "width", "height", "px_sum",
      "b0", "b1", "b2", "b3")
  }

  /** Perceptual difference-hash (dHash) of the DECODED image: the raster is
    * nearest-neighbor sampled onto a 9-column × 8-row grid
    * (`sample(gx, gy) = pixel(⌊gx·w/9⌋, ⌊gy·h/8⌋)`), and bit `gy·8 + gx` of
    * the 64-bit fingerprint is set iff `sample(gx, gy) > sample(gx+1, gy)`
    * — the classic horizontal-gradient fingerprint (Krawetz's dHash), which
    * survives re-encoding and brightness scaling because it keys on local
    * gradient SIGNS, not absolute values. Nearest-neighbor (rather than a
    * box filter) keeps the sample positions pure integer functions of
    * (w, h), so the DuckDB oracle can state the expected hash from the
    * fixture's byte grid without an image decoder, and it stays defined
    * for rasters narrower than the grid. 72 samples per image — decode
    * cost dominates, the hash is free.
    *
    * Undecodable payloads degrade to the same fingerprint computed over
    * the byte-grid pseudo-pixels (`w = len % 13 + 3`, the
    * [[withImagePayload]] layout; `decoded = 0`) — the degrade-don't-fail
    * contract every decode here carries.
    *
    * Near-duplicate pairs come from [[Simhash.nearDupPairsOf]] over this
    * table: the 4×16-bit pigeonhole banding is fingerprint-agnostic, so
    * image near-dedup reuses the text path's exact-recall candidate join
    * unchanged — one (band, value) shuffle, never pairs.
    */
  def dHash(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        val samples = new Array[Int](9 * 8)
        var decoded = 0L
        if (img != null) {
          decoded = 1L
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val shift = math.max(0, raster.getSampleModel.getSampleSize(0) - 8)
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 9) {
              samples(gy * 9 + gx) = math.min(255,
                raster.getSample(gx * w / 9, gy * h / 8, 0) >>> shift)
              gx += 1
            }
            gy += 1
          }
        } else {
          val n = bytes.length
          val w = n % 13 + 3
          val h = math.max(1, (n + w - 1) / w)
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 9) {
              val pos = (gy * h / 8) * w + gx * w / 9
              samples(gy * 9 + gx) = if (pos < n) bytes(pos) & 0xff else 0
              gx += 1
            }
            gy += 1
          }
        }
        var fp = 0L
        var k = 0
        while (k < 64) {
          val (gy, gx) = (k / 8, k % 8)
          if (samples(gy * 9 + gx) > samples(gy * 9 + gx + 1)) fp |= 1L << k
          k += 1
        }
        (id, decoded, fp)
      }
    }.toDF("doc_id", "decoded", "fp")
  }

  /** Attach a REAL WAV payload to each document: one 16-bit signed PCM
    * mono sample per text byte (sample = `(byte·2654435761) mod 2¹⁶ −
    * 2¹⁵` — the Knuth-hash spread makes amplitude sign and the zero-cross
    * count non-degenerate, unlike a direct byte→amplitude map where ASCII
    * would pin every sample negative), 8 kHz, wrapped in an actual RIFF/WAV
    * container by `javax.sound.sampled.AudioSystem` — which ships with the
    * JVM, so like the PNG path this needs no native libs. The sample being
    * a pure per-byte function of the text is what lets the DuckDB oracle
    * state the expected decode output without a WAV parser of its own.
    */
  def withAudioPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = docs
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(
        8000f, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)
      val waveWriter = audioFileWriters
        .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException(
          "JVM ships no WAVE AudioFileWriter — javax.sound providers missing"))
      rows.map { case (id, bytes) =>
        val n = bytes.length
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = (((bytes(i) & 0xff).toLong * 2654435761L) % 65536L - 32768L).toInt
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream(n * 2 + 64)
        // waveWriter resolved per partition from the JVM-cached provider
        // table (see audioFileWriters): AudioSystem.write per row would
        // serialize all task threads on the registry lock
        waveWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        (id, bos.toByteArray, n.toLong)
      }
    }.toDF("doc_id", "media", "n_samples")
      .withColumn("media_meta", struct(
        lit("wav").as("format"), col("n_samples"),
        lit(8000).as("sample_rate")))
      .drop("n_samples")
  }

  /** REAL audio decode behind the same partition-batched binary-in /
    * features-out contract as [[decodeImage]]: the JVM's own
    * `javax.sound.sampled` providers parse the container (WAV/AIFF/AU —
    * whatever the provider table handles, iterated directly instead of
    * through `AudioSystem`'s synchronized registry; see
    * [[audioFileReaders]]), and the features come from the
    * ACTUAL decoded 16-bit PCM samples of channel 0 — sample count and
    * rate, the summed absolute amplitude, the peak, and the zero-crossing
    * count (the classic cheap speech/music discriminator). `decoded = 1`
    * marks a successful decode; an unparsable or non-16-bit-PCM payload
    * falls back to byte-level pseudo-features (`decoded = 0`,
    * `sample_rate`/`zero_cross` 0), so a corrupt file degrades instead of
    * failing the batch — the contract every decoder here honors.
    */
  def decodeAudio(withMedia: DataFrame): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    in.mapPartitions { rows =>
      // the JVM-cached provider table (see audioFileReaders) replayed the
      // way AudioSystem.getAudioInputStream iterates it — first reader that
      // recognizes the container wins — minus the per-call registry lock
      // that serializes task threads. `hint` remembers the last successful
      // reader so a homogeneous partition (all WAV) parses in one attempt.
      val readers = audioFileReaders
      var hint: javax.sound.sampled.spi.AudioFileReader = null
      def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
        if (hint != null) {
          try return hint.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
        }
        var i = 0
        while (i < readers.length) {
          if (readers(i) ne hint) {
            try {
              val ais = readers(i)
                .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
              hint = readers(i)
              return ais
            } catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
          }
          i += 1
        }
        throw new javax.sound.sampled.UnsupportedAudioFileException(
          "no provider recognizes the container")
      }
      rows.map { case (id, bytes) =>
        // NonFatal for the same reason as decodeImage: container parsers
        // throw more than UnsupportedAudioFileException on malformed
        // headers, and none of it may kill the batch
        // capture format fields from the ONE container parse (a second
        // getAudioFileFormat probe per row doubled parse cost at corpus
        // scale for information already in hand)
        var pcm: Array[Byte] = null
        var ch = 1
        var big = false
        var rate = 0L
        try {
          val ais = openAudio(bytes)
          try {
            val f = ais.getFormat
            if (f.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                f.getSampleSizeInBits == 16) {
              ch = f.getChannels
              big = f.isBigEndian
              rate = f.getSampleRate.toLong
              pcm = ais.readAllBytes()
            }
          } finally ais.close()
        } catch { case scala.util.control.NonFatal(_) => }
        if (pcm != null) {
          val nSamples = pcm.length / (2 * ch)
          var ampSum = 0L
          var peak = 0L
          var zeroCross = 0L
          var prevNeg = false
          var i = 0
          while (i < nSamples) {
            val o = i * 2 * ch // channel 0 of frame i
            val v =
              if (big) ((pcm(o) << 8) | (pcm(o + 1) & 0xff)).toShort.toInt
              else ((pcm(o + 1) << 8) | (pcm(o) & 0xff)).toShort.toInt
            val a = math.abs(v.toLong)
            ampSum += a
            if (a > peak) peak = a
            val neg = v < 0
            if (i > 0 && neg != prevNeg) zeroCross += 1L
            prevNeg = neg
            i += 1
          }
          (id, 1L, rate, nSamples.toLong, ampSum, peak, zeroCross)
        } else {
          var sum = 0L
          var peak = 0L
          var i = 0
          while (i < bytes.length) {
            val b = (bytes(i) & 0xff).toLong
            sum += b
            if (b > peak) peak = b
            i += 1
          }
          (id, 0L, 0L, bytes.length.toLong, sum, peak, 0L)
        }
      }
    }.toDF("doc_id", "decoded", "sample_rate", "n_samples", "amp_sum",
      "peak", "zero_cross")
  }

  /** Attach a REAL VIDEO payload to each document: an actual RIFF/AVI
    * container (`avih`/`strh`/`strf` headers, `movi` chunk list, `idx1`
    * index — the structure any AVI demuxer reads) whose frames are 8×8
    * grayscale tiles of consecutive 64-byte text slices, encoded per
    * `codec`:
    *
    *  - `"png"` (default, fourcc `MPNG`): lossless — what lets the DuckDB
    *    oracle state the decoded pixels exactly (`llm_decode_video`).
    *  - `"jpeg"` (fourcc `MJPG`): REAL Motion-JPEG, each frame encoded by
    *    the JVM-builtin ImageIO JPEG writer — the real-world compressed
    *    codec shape, with zero new dependencies. Lossy, so its oracle row
    *    (`llm_decode_video_mjpeg`) asserts the codec-independent columns
    *    (decoded/n_frames/n_sampled — n_sampled still proves every sampled
    *    frame DECODED) and a spec pins pixel fidelity bounds.
    *
    * H.264 stays out of scope: no JVM-builtin codec. Either way the
    * CONTAINER is a real AVI bytestream and [[decodeVideo]] earns its
    * frames by genuinely demuxing it.
    */
  def withVideoPayload(docs: DataFrame, frameW: Int = 8,
                       frameH: Int = 8, codec: String = "png"): DataFrame = {
    require(codec == "png" || codec == "jpeg", s"unsupported codec $codec")
    val spark = docs.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = docs
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    val (fw, fh) = (frameW, frameH)
    val useJpeg = codec == "jpeg"
    val fourcc = if (useJpeg) "MJPG" else "MPNG"
    in.mapPartitions { rows =>
      // one encoder per partition: reused row/deflate buffers and ONE
      // reset-between-frames Deflater (see [[PngEncoder]] for why the
      // ImageIO.write path was unusable at 5+ frames per document); its
      // native zlib state is released at task end, not left to the cleaner.
      // The MJPEG variant reuses one ImageWriter + BufferedImage + output
      // buffer per partition for the same reason (the cost of the
      // convenience ImageIO.write path is per-call writer lookup and stream
      // construction, not the DCT).
      val enc: Array[Byte] => Array[Byte] = if (useJpeg) {
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => writer.dispose()))
        val img = new java.awt.image.BufferedImage(fw, fh,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val buf = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        val baos = new java.io.ByteArrayOutputStream(1024)
        gray => {
          System.arraycopy(gray, 0, buf, 0, fw * fh)
          baos.reset()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
          try { writer.setOutput(ios); writer.write(img); ios.flush() }
          finally ios.close()
          baos.toByteArray
        }
      } else {
        val png = new Multimodal.PngEncoder(fw, fh)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => png.close()))
        png.encode
      }
      val gray = new Array[Byte](fw * fh)
      rows.map { case (id, bytes) =>
        val frameBytes = fw * fh
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        val frames = (0 until nFrames).map { f =>
          var i = 0
          while (i < frameBytes) {
            val src = f * frameBytes + i
            gray(i) = if (src < bytes.length) bytes(src) else 0
            i += 1
          }
          enc(gray)
        }
        (id, Multimodal.buildAvi(frames, fw, fh, fourcc), nFrames)
      }
    }.toDF("doc_id", "media", "n_frames")
      .withColumn("media_meta", struct(
        lit("avi").as("format"), col("n_frames"),
        lit(frameW).as("width"), lit(frameH).as("height")))
      .drop("n_frames")
  }

  /** Minimal spec-conformant PNG encoder for the fixed-size grayscale
    * frames [[withVideoPayload]] generates — written by hand because the
    * general-purpose `ImageIO.write` path was measured (thread-sampled) to
    * spend its time in `MemoryCacheImageOutputStream`'s block bookkeeping
    * and a fresh `Deflater.init` + cleaner registration PER FRAME, not in
    * compression: for an 8×8 tile the encoder was ~all overhead. One
    * instance per partition reuses its row buffer, deflate buffer, CRC, and
    * a single reset-between-frames `Deflater`. The output is a standard
    * 8-bit grayscale PNG (signature, IHDR, one IDAT holding the zlib stream
    * of filter-0-prefixed rows, IEND) — `javax.imageio` decodes it
    * byte-identically to what `ImageIO.write` produced, which is pinned by
    * the unchanged decode oracles.
    */
  private[graft] final class PngEncoder(w: Int, h: Int) {
    private val raw = new Array[Byte]((w + 1) * h)
    // worst-case deflate growth for incompressible input is ~5 bytes per
    // 64 KB stored block + zlib header/trailer; len/1000 over-covers that
    // at any frame size the public (frameW, frameH) parameters can reach
    private val defBuf =
      new Array[Byte]((w + 1) * h + ((w + 1) * h) / 1000 + 128)
    private val deflater = new java.util.zip.Deflater()
    private val crc = new java.util.zip.CRC32()
    private def u32(out: Array[Byte], o: Int, v: Long): Unit = {
      out(o) = ((v >> 24) & 0xff).toByte; out(o + 1) = ((v >> 16) & 0xff).toByte
      out(o + 2) = ((v >> 8) & 0xff).toByte; out(o + 3) = (v & 0xff).toByte
    }
    private def chunk(out: Array[Byte], o: Int, tag: String,
                      data: Array[Byte], len: Int): Int = {
      u32(out, o, len.toLong)
      var i = 0
      while (i < 4) { out(o + 4 + i) = tag.charAt(i).toByte; i += 1 }
      System.arraycopy(data, 0, out, o + 8, len)
      crc.reset(); crc.update(out, o + 4, 4 + len)
      u32(out, o + 8 + len, crc.getValue)
      o + 12 + len
    }
    private val ihdr = new Array[Byte](13)
    u32(ihdr, 0, w.toLong); u32(ihdr, 4, h.toLong)
    ihdr(8) = 8 /*bit depth*/; ihdr(9) = 0 /*grayscale*/
    /** `gray` holds w*h samples row-major; values are bytes 0..255. */
    def encode(gray: Array[Byte]): Array[Byte] = {
      var y = 0
      while (y < h) {
        raw(y * (w + 1)) = 0 // filter type None per row
        System.arraycopy(gray, y * w, raw, y * (w + 1) + 1, w)
        y += 1
      }
      deflater.reset()
      deflater.setInput(raw)
      deflater.finish()
      var n = 0
      while (!deflater.finished() && n < defBuf.length)
        n += deflater.deflate(defBuf, n, defBuf.length - n)
      require(deflater.finished(), "PNG deflate buffer undersized")
      val out = new Array[Byte](8 + 25 + (12 + n) + 12)
      // signature
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      var i = 0
      while (i < 8) { out(i) = sig(i).toByte; i += 1 }
      var o = chunk(out, 8, "IHDR", ihdr, 13)
      o = chunk(out, o, "IDAT", defBuf, n)
      chunk(out, o, "IEND", Array.emptyByteArray, 0)
      out
    }
    /** Release the Deflater's native zlib state deterministically — on a
      * long-lived executor, waiting for the GC cleaner accumulates
      * off-heap memory across thousands of tasks.
      */
    def close(): Unit = deflater.end()
  }

  /** Minimal structurally-valid AVI (RIFF) container around pre-encoded
    * frame payloads: `hdrl` with `avih` + one `vids` stream (`strh` fourcc
    * `MPNG`, `strf` BITMAPINFOHEADER), `movi` list of `00dc` chunks (even-
    * byte padded, per RIFF), `idx1` keyframe index. Little-endian
    * throughout, sizes exact — a strict RIFF walker parses it.
    */
  private[graft] def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
                              fourcc4: String = "MPNG"): Array[Byte] = {
    require(fourcc4.length == 4, s"fourcc must be 4 chars: $fourcc4")
    val out = new java.io.ByteArrayOutputStream(
      frames.map(_.length + 16).sum + 512)
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def fcc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    def pad(n: Int) = n + (n & 1) // RIFF chunks align to even bytes
    val moviSize = 4 + frames.map(f => 8 + pad(f.length)).sum
    val idxSize = frames.length * 16
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)
    fcc("RIFF"); u32(riffSize); fcc("AVI ")
    fcc("LIST"); u32(hdrlSize); fcc("hdrl")
    fcc("avih"); u32(56)
    u32(33333); u32(0); u32(0); u32(0x10 /*HASINDEX*/)
    u32(frames.length); u32(0); u32(1); u32(maxFrame)
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
    fcc("LIST"); u32(4 + (8 + 56) + (8 + 40)); fcc("strl")
    fcc("strh"); u32(56)
    fcc("vids"); fcc(fourcc4); u32(0); u32(0); u32(0)
    u32(1); u32(30); u32(0); u32(frames.length); u32(maxFrame)
    u32(0xFFFFFFFFL /*quality: default*/); u32(0); u32(0); u32(0)
    fcc("strf"); u32(40)
    u32(40); u32(w); u32(h); out.write(1); out.write(0); out.write(8); out.write(0)
    fcc(fourcc4); u32(w * h); u32(0); u32(0); u32(0); u32(0)
    fcc("LIST"); u32(moviSize); fcc("movi")
    val offsets = new Array[Int](frames.length)
    var moviPos = 4 // offset within movi data, from after 'movi' fourcc
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = moviPos
      fcc("00dc"); u32(f.length); out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0)
      moviPos += 8 + pad(f.length)
    }
    fcc("idx1"); u32(idxSize)
    frames.zipWithIndex.foreach { case (f, i) =>
      fcc("00dc"); u32(0x10 /*KEYFRAME*/); u32(offsets(i)); u32(f.length)
    }
    out.toByteArray
  }

  /** REAL video decode: demux the RIFF/AVI container (verify the RIFF
    * magic and `AVI ` form type, walk the top-level chunk list to the
    * `movi` LIST, iterate its `00dc` frame chunks — an actual bytestream
    * parse, not an offset table lookup), KEYFRAME-SAMPLE every `every`-th
    * frame, and decode each sampled frame's payload with `javax.imageio`
    * — features come from the decoded pixels of the sampled frames (the
    * [[decodeImage]] discipline applied per frame). Frame sampling before
    * decode is the production video shape: at corpus scale the demux walk
    * is cheap sequential IO and the codec work only runs on the sampled
    * frames. An unparsable container (or one with no `movi` list) degrades
    * to byte-level pseudo-features (`decoded = 0`), never failing the
    * batch; an individual undecodable FRAME is skipped (dropped from
    * `n_sampled`), degrading per-frame like decodeImage degrades per-row.
    */
  def decodeVideo(withMedia: DataFrame, every: Int = 3): DataFrame = {
    val spark = withMedia.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] = withMedia
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    val k = every
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      // one cached reader PER CODEC per partition (the encode-side rationale
      // in [[withVideoPayload]] applies symmetrically), dispatched on the
      // frame payload's magic bytes — PNG signature or JPEG SOI — so both
      // the Motion-PNG and the MJPEG container pay zero per-frame reader
      // lookups and zero exception-driven dispatch; an unrecognized magic
      // falls back to the generic ImageIO.read probe before the per-frame
      // skip, so foreign codecs still degrade, not fail
      val pngReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      val jpegReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("jpeg").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit] { _ =>
          pngReader.dispose(); jpegReader.dispose()
        })
      def readFrame(payload: Array[Byte]): java.awt.image.BufferedImage =
        try {
          val reader =
            if (payload.length >= 2 &&
              (payload(0) & 0xff) == 0x89 && payload(1) == 'P') pngReader
            else if (payload.length >= 2 &&
              (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) jpegReader
            else null
          if (reader == null)
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          else {
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            try { reader.setInput(iis); reader.read(0) } finally iis.close()
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
        }
      rows.map { case (id, bytes) =>
        // sampled demux: only every k-th frame's payload is even copied
        // out of the container (via idx1 when present), so per-doc cost
        // tracks n_sampled, not n_frames
        val demuxed = Multimodal.demuxAviSampled(bytes, k)
        if (demuxed != null) {
          val (nFrames, frames) = demuxed
          var nSampled = 0L
          var sum = 0L
          val hist = new Array[Long](4)
          var f = 0
          while (f < frames.length) {
            val img = readFrame(frames(f))
            if (img != null) {
              nSampled += 1L
              val (w, h) = (img.getWidth, img.getHeight)
              val raster = img.getRaster
              val row = new Array[Int](w)
              var y = 0
              while (y < h) {
                raster.getSamples(0, y, w, 1, 0, row)
                var x = 0
                while (x < w) {
                  val px = math.min(255, row(x))
                  sum += px
                  hist(px >> 6) += 1L
                  x += 1
                }
                y += 1
              }
            }
            f += 1
          }
          (id, 1L, nFrames.toLong, nSampled, sum,
            hist(0), hist(1), hist(2), hist(3))
        } else {
          var sum = 0L
          val hist = new Array[Long](4)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            sum += b
            hist(b >> 6) += 1L
            i += 1
          }
          (id, 0L, 0L, 0L, sum, hist(0), hist(1), hist(2), hist(3))
        }
      }
    }.toDF("doc_id", "decoded", "n_frames", "n_sampled", "px_sum",
      "b0", "b1", "b2", "b3")
  }

  /** Walk a RIFF/AVI bytestream and return its `00dc` frame payloads, or
    * null when the container is unparsable (wrong magic, truncated chunk,
    * no `movi` list). Bounds-checked at every step — a malformed size
    * field degrades to null rather than throwing.
    */
  private[graft] def demuxAvi(bytes: Array[Byte]): Array[Array[Byte]] = {
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return null
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
    var p = 12L
    // top-level chunk walk to the movi LIST
    var moviStart = -1L
    var moviEnd = -1L
    while (p + 8 <= riffEnd && moviStart < 0) {
      val id = fcc(p.toInt)
      val sz = u32(p.toInt + 4)
      if (id == "LIST" && p + 12 <= riffEnd && fcc(p.toInt + 8) == "movi") {
        moviStart = p + 12
        moviEnd = math.min(riffEnd, p + 8 + sz)
      }
      p += 8 + sz + (sz & 1)
    }
    if (moviStart < 0) return null
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var q = moviStart
    while (q + 8 <= moviEnd) {
      val id = fcc(q.toInt)
      val sz = u32(q.toInt + 4)
      if (q + 8 + sz > moviEnd) return null // truncated chunk
      if (id == "00dc")
        frames += java.util.Arrays.copyOfRange(bytes, (q + 8).toInt,
          (q + 8 + sz).toInt)
      q += 8 + sz + (sz & 1)
    }
    frames.toArray
  }

  /** Sampled demux: the frame payloads at stride `every`, plus the TOTAL
    * frame count, WITHOUT copying unsampled frames. When the container
    * carries an `idx1` index (ours always does; real capture AVIs almost
    * always do), the index gives both the count and each sampled chunk's
    * offset directly — per-document demux cost is then bounded by
    * `n_sampled`, not `n_frames`, which is what keeps the sampled-decode
    * contract honest at scale (a 10 000-frame video with stride 3 must not
    * pay 10 000 payload copies to decode 3 334). Without an index the
    * `movi` walk still runs (header-skip sequential scan, no seek
    * alternative exists) but only sampled chunks are copied.
    *
    * Every idx1 entry is validated against the chunk it points at (fourcc
    * + size match, in-bounds); ANY mismatch discards the index and falls
    * back to the walk — a stale or lying index must not silently drop
    * frames. Returns null when the container is unparsable (same contract
    * as [[demuxAvi]]).
    */
  private[graft] def demuxAviSampled(bytes: Array[Byte], every: Int): (Int, Array[Array[Byte]]) = {
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return null
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
    var p = 12L
    var moviStart = -1L // first byte AFTER the 'movi' fourcc
    var moviEnd = -1L
    var idxStart = -1L
    var idxEnd = -1L
    while (p + 8 <= riffEnd && (moviStart < 0 || idxStart < 0)) {
      val id = fcc(p.toInt)
      val sz = u32(p.toInt + 4)
      if (id == "LIST" && p + 12 <= riffEnd && fcc(p.toInt + 8) == "movi") {
        moviStart = p + 12
        moviEnd = math.min(riffEnd, p + 8 + sz)
      } else if (id == "idx1") {
        idxStart = p + 8
        idxEnd = math.min(riffEnd, p + 8 + sz)
      }
      p += 8 + sz + (sz & 1)
    }
    if (moviStart < 0) return null
    if (idxStart >= 0) {
      // idx1 path: offsets are relative to the 'movi' fourcc position
      val moviFcc = moviStart - 4
      val nEntries = ((idxEnd - idxStart) / 16).toInt
      val sampled = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var frameIdx = 0
      var e = 0
      var valid = true
      while (e < nEntries && valid) {
        val off = idxStart + e.toLong * 16
        if (fcc(off.toInt) == "00dc") {
          if (frameIdx % every == 0) {
            val chunk = moviFcc + u32(off.toInt + 8)
            val len = u32(off.toInt + 12)
            // the entry must point at a matching in-bounds 00dc chunk
            if (chunk + 8 + len > moviEnd || chunk < moviStart - 4 ||
              fcc(chunk.toInt) != "00dc" || u32(chunk.toInt + 4) != len)
              valid = false
            else sampled += java.util.Arrays.copyOfRange(bytes,
              (chunk + 8).toInt, (chunk + 8 + len).toInt)
          }
          frameIdx += 1
        }
        e += 1
      }
      if (valid) return (frameIdx, sampled.toArray)
    }
    // no (trustworthy) index: sequential movi walk, copying only sampled
    val sampled = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var q = moviStart
    var frameIdx = 0
    while (q + 8 <= moviEnd) {
      val id = fcc(q.toInt)
      val sz = u32(q.toInt + 4)
      if (q + 8 + sz > moviEnd) return null // truncated chunk
      if (id == "00dc") {
        if (frameIdx % every == 0)
          sampled += java.util.Arrays.copyOfRange(bytes, (q + 8).toInt,
            (q + 8 + sz).toInt)
        frameIdx += 1
      }
      q += 8 + sz + (sz & 1)
    }
    (frameIdx, sampled.toArray)
  }

  /** The multimodal pipeline end-to-end: payload → batch decode → flat
    * feature columns (what a downstream trainer would read).
    */
  def featureTable(docs: DataFrame): DataFrame =
    decodeStub(withPayload(docs))
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("head_byte").cast("long").as("head_byte"), col("checksum"),
        element_at(col("features"), 1).as("f0"),
        element_at(col("features"), 2).as("f1"),
        element_at(col("features"), 3).as("f2"),
        element_at(col("features"), 4).as("f3"))
}
