package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. The
  * binary column is never interpreted by Spark itself — decode happens
  * inside partition-local batch functions, the same execution shape as
  * a Pandas-UDF/`mapInPandas` pipeline (SURVEY north star: multimodal
  * columns as binary + metadata).
  */
final case class MediaRecord(
    media_id: Long,
    kind: String,           // image | audio | video
    uri: String,
    content: Array[Byte],
    width: Option[Int],     // declared metadata (may be absent pre-decode)
    height: Option[Int],
    duration_ms: Option[Long])

/** Decoded per-image features. */
final case class ImageFeatures(
    media_id: Long,
    width: Int,
    height: Int,
    n_bytes: Long,
    brightness: Double,     // mean pixel intensity in [0,1]
    aspect_ratio: Double)

/** One embedding component in long format. */
final case class MediaEmbeddingRow(media_id: Long, dim: Int, value: Double)

/** Perceptual difference-hash of a decoded image; `dhash = -1` with
  * `decoded = false` marks an undecodable payload.
  */
final case class ImageHash(media_id: Long, dhash: Long, decoded: Boolean)

/** Energy-profile hash of a decoded audio clip; `ahash = -1` with
  * `decoded = false` marks an undecodable payload.
  */
final case class AudioHash(media_id: Long, ahash: Long, decoded: Boolean)

/** Decoded per-audio features. */
final case class AudioFeatures(
    media_id: Long,
    sample_rate: Int,
    channels: Int,
    n_samples: Long,
    duration_us: Long,
    rms: Double)            // root-mean-square amplitude in [0,1]; -1 = undecodable

/** Decoded per-frame features (REAL multi-frame decode path). */
final case class FrameFeatures(
    media_id: Long,
    frame_ix: Int,
    width: Int,
    height: Int,
    brightness: Double)

/** Sampled video frame reference. */
final case class FrameSample(
    media_id: Long,
    frame_ix: Int,
    ts_ms: Long,
    frame_content: Array[Byte])

/** Multimodal column plumbing. The IMAGE path decodes for real via
  * javax.imageio (JDK built-in — PNG/JPEG/GIF/BMP); the video/audio
  * paths remain clearly-marked STUBS because this container ships no
  * ffmpeg/ONNX. Everything around them is real and load-bearing at
  * scale: schema, encoder round-trips, partition-local batch iteration
  * (no per-row JNI/codec setup), size-aware repartitioning, and
  * frame-sampling row expansion.
  */
object Multimodal {

  /** Read a media table: binary `content` + metadata columns. Parquet
    * stores binary natively; large payloads argue for small row groups,
    * so writers should `maxRecordsPerFile`-limit media tables.
    */
  def readMedia(spark: SparkSession, path: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(path).as[MediaRecord]
  }

  /** Decode images to features, batch-per-partition, via javax.imageio
    * (REAL decode — PNG/JPEG/GIF/BMP ship with the JDK). Width, height,
    * brightness (mean pixel intensity over a bounded ≤128×128 sample
    * grid, so a 100-megapixel scan costs the same as a thumbnail) and
    * aspect ratio come from the decoded pixels. Undecodable payloads
    * fall back to the DECLARED metadata with `brightness = -1.0` as the
    * explicit not-decoded sentinel — a 100 TB crawl always contains
    * corrupt media, and dropping rows silently would skew joins.
    */
  def decodeImage(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      // per-partition codec setup: no temp-file cache for byte streams
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val n = m.content.length.toLong
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img != null) {
          val w = img.getWidth
          val h = img.getHeight
          val stepX = math.max(1, w / 128)
          val stepY = math.max(1, h / 128)
          var sum = 0.0
          var cnt = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              sum += (r + g + b) / (3.0 * 255.0)
              cnt += 1
              x += stepX
            }
            y += stepY
          }
          val brightness = if (cnt == 0) 0.0 else sum / cnt
          ImageFeatures(m.media_id, w, h, n, brightness, w.toDouble / h)
        } else {
          val w = m.width.getOrElse(0)
          val h = m.height.getOrElse(0)
          ImageFeatures(m.media_id, w, h, n, -1.0,
            if (h == 0) 0.0 else w.toDouble / h)
        }
      }
    }
  }

  /** Perceptual difference-hash (dHash) per image: decode, reduce to a
    * 9×8 luma grid, emit one bit per horizontally-adjacent cell pair
    * (left brighter ⇒ 0, darker ⇒ 1) — 64 bits that survive re-encoding
    * and resizing, the standard cheap key for IMAGE near-dup detection
    * in crawl curation (Krawetz's dHash). All arithmetic is integer:
    * cell comparisons cross-multiply (sum, count) rationals instead of
    * dividing, so the hash is bit-deterministic on every JVM. The same
    * bounded sampling grid as [[decodeImage]] keeps a 100-megapixel
    * scan at thumbnail cost; undecodable payloads keep their row with
    * the explicit sentinel rather than vanishing.
    */
  def dhashImages(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth < 1 || img.getHeight < 1)
          ImageHash(m.media_id, -1L, decoded = false)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sums = Array.ofDim[Long](9, 8)
          val cnts = Array.ofDim[Long](9, 8)
          // ≤144×128 sample grid: ~16 samples per cell edge, bounded work
          val stepX = math.max(1, w / 144)
          val stepY = math.max(1, h / 128)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 9 / w
              val rgb = img.getRGB(x, y)
              sums(cx)(cy) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              cnts(cx)(cy) += 1
              x += stepX
            }
            y += stepY
          }
          var bits = 0L
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 8) {
              // avg(left) < avg(right) via cross-multiplication (exact;
              // cells a tiny image leaves empty compare as zero)
              val lc = math.max(1L, cnts(cx)(cy))
              val rc = math.max(1L, cnts(cx + 1)(cy))
              if (sums(cx)(cy) * rc < sums(cx + 1)(cy) * lc)
                bits |= 1L << (cy * 8 + cx)
              cx += 1
            }
            cy += 1
          }
          ImageHash(m.media_id, bits, decoded = true)
        }
      }
    }
  }

  /** Exact-duplicate pairs by perceptual-hash equality (hamming-0;
    * banding the 64 bits like SimHash extends this to hamming>0). Scale
    * shape: the hash table is THIN (id + 64-bit key), the self-join
    * shuffles on the hash only, and degenerate buckets — a crawl's
    * millions of identical blank thumbnails / silent clips — are
    * dropped by `maxBucket` with the same rationale as the LSH/SimHash
    * caps (a bucket that size is one dup GROUP, not interesting pairs).
    */
  def hashDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                   maxBucket: Int = 8): DataFrame = {
    // decode+hash runs once: the thin (hash, id) frame feeds the bucket
    // count AND both self-join sides (multi-consumer subtree)
    val h = graft.util.Scratch.transientCheckpoint(hashes
      .filter(col("decoded") && col(hashCol) =!= lit(-1L))
      .select(col(hashCol), col(idCol))
      .localCheckpoint())
    val small = h.groupBy(hashCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(hashCol)
    val ok = h.join(small, hashCol)
    ok.select(col(hashCol), col(idCol).as("id_a"))
      .join(ok.select(col(hashCol), col(idCol).as("id_b")), hashCol)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  def imageDupPairs(hashes: Dataset[ImageHash], maxBucket: Int = 8): DataFrame =
    hashDupPairs(hashes.toDF(), "media_id", "dhash", maxBucket)

  def audioDupPairs(hashes: Dataset[AudioHash], maxBucket: Int = 8): DataFrame =
    hashDupPairs(hashes.toDF(), "media_id", "ahash", maxBucket)

  /** Energy-profile hash per audio clip — the audio analogue of
    * [[dhashImages]]: decode PCM16 for real, bucket the (bounded) span
    * of samples into 65 equal windows of summed |amplitude|, emit one
    * bit per adjacent window pair (quieter ⇒ 0, louder ⇒ 1). Container
    * and endianness invariant (WAV and AIFF of the same samples hash
    * identically); all arithmetic is integer with cross-multiplied
    * rational comparisons — bit-deterministic on every JVM.
    */
  def ahashAudio(media: Dataset[MediaRecord]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.map { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(m.content)))
          try {
            val fmt = in.getFormat
            val bytesPerFrame = fmt.getFrameSize
            val frames = in.getFrameLength
            if (fmt.getSampleSizeInBits != 16 || bytesPerFrame <= 0 || frames <= 0)
              AudioHash(m.media_id, -1L, decoded = false)
            else {
              val maxFrames = math.min(frames, 1000000L)
              val totalSamples = maxFrames * fmt.getChannels
              val sums = new Array[Long](65)
              val cnts = new Array[Long](65)
              val buf = new Array[Byte](bytesPerFrame * 4096)
              var remaining = maxFrames
              var idx = 0L
              var eof = false
              while (remaining > 0 && !eof) {
                val want = math.min(buf.length.toLong, remaining * bytesPerFrame).toInt
                val n = in.read(buf, 0, want)
                if (n <= 0) eof = true
                else {
                  var i = 0
                  while (i + 1 < n) {
                    val s =
                      if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                      else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                    val w = (idx * 65 / totalSamples).toInt
                    sums(w) += math.abs(s.toLong)
                    cnts(w) += 1
                    idx += 1
                    i += 2
                  }
                  remaining -= n / bytesPerFrame
                }
              }
              var bits = 0L
              var w = 0
              while (w < 64) {
                val lc = math.max(1L, cnts(w))
                val rc = math.max(1L, cnts(w + 1))
                if (sums(w) * rc < sums(w + 1) * lc) bits |= 1L << w
                w += 1
              }
              AudioHash(m.media_id, bits, decoded = true)
            }
          } finally in.close()
        } catch {
          case scala.util.control.NonFatal(_) =>
            AudioHash(m.media_id, -1L, decoded = false)
        }
      }
    }
  }

  /** Decode audio to features, batch-per-partition, via
    * javax.sound.sampled (REAL decode — WAV/AIFF/AU ship with the JDK).
    * Sample rate, channel count and frame count come from the decoded
    * stream; RMS amplitude is computed over the 16-bit PCM samples
    * (bounded to the first ~1M frames so an hour-long recording costs
    * the same as a clip). Undecodable payloads keep the row with
    * `rms = -1.0` and zeroed audio fields — same corrupt-media policy
    * as [[decodeImage]].
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.map { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(m.content)))
          try {
            val fmt = in.getFormat
            val rate = fmt.getSampleRate.toInt
            val channels = fmt.getChannels
            val frames = in.getFrameLength
            val durationUs =
              if (rate > 0) frames * 1000000L / rate else 0L
            // RMS over 16-bit PCM, bounded read
            val bytesPerFrame = fmt.getFrameSize
            val maxFrames = math.min(frames, 1000000L)
            var sumSq = 0.0
            var count = 0L
            if (fmt.getSampleSizeInBits == 16 && bytesPerFrame > 0) {
              val buf = new Array[Byte](bytesPerFrame * 4096)
              var remaining = maxFrames
              var eof = false
              while (remaining > 0 && !eof) {
                val want = math.min(buf.length.toLong, remaining * bytesPerFrame).toInt
                val n = in.read(buf, 0, want)
                if (n <= 0) eof = true
                else {
                  var i = 0
                  while (i + 1 < n) {
                    val s =
                      if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                      else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
                    val v = s / 32767.0
                    sumSq += v * v
                    count += 1
                    i += 2
                  }
                  remaining -= n / bytesPerFrame
                }
              }
            }
            val rms = if (count == 0) 0.0 else math.sqrt(sumSq / count)
            AudioFeatures(m.media_id, rate, channels, frames, durationUs, rms)
          } finally in.close()
        } catch {
          case scala.util.control.NonFatal(_) =>
            AudioFeatures(m.media_id, 0, 0, 0L, m.duration_ms.getOrElse(0L) * 1000L, -1.0)
        }
      }
    }
  }

  /** Deterministic constant-amplitude mono PCM16 WAV — the gate/test
    * fixture generator for [[decodeAudio]] (real codec, oracle-derivable
    * output: every sample equals `sampleValue`, so the decoded RMS is
    * exactly |sampleValue|/32767 and duration is nSamples/sampleRate).
    */
  def synthesizeWav(sampleRate: Int, nSamples: Int, sampleValue: Short): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0, s"degenerate wav $sampleRate/$nSamples")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // PCM16, mono, little-endian
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      pcm(2 * i) = (sampleValue & 0xff).toByte
      pcm(2 * i + 1) = ((sampleValue >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic solid-gray PNG — the gate/test fixture generator for
    * [[decodeImage]] (real codec, oracle-derivable output: decoded
    * width/height/brightness are pure functions of the inputs).
    */
  def synthesizePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate image ${width}x$height")
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic pseudo-random PCM16 mono clip under a chosen
    * container (wav = little-endian, aiff = big-endian): sample i is a
    * splitmix64-style mix of (seed, i), so distinct seeds give clips
    * whose energy-profile hashes are effectively independent draws
    * while one seed under both containers decodes to identical samples
    * — the audio analogue of [[synthesizePatternImage]].
    */
  def synthesizePatternAudio(sampleRate: Int, nSamples: Int, seed: Long,
                             format: String = "wav"): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0, s"degenerate clip $sampleRate/$nSamples")
    // byte order follows the container's native PCM layout (AIFF is
    // big-endian) — the decoded SAMPLES are identical either way
    val big = format == "aiff"
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, big)
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      var v = seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL
      v ^= (v >>> 29); v *= 0xBF58476D1CE4E5B9L; v ^= (v >>> 32)
      val s = (v & 0xffff).toShort
      val (lo, hi) = ((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
      pcm(2 * i) = if (big) hi else lo
      pcm(2 * i + 1) = if (big) lo else hi
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val tpe = format match {
      case "wav" => javax.sound.sampled.AudioFileFormat.Type.WAVE
      case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
      case other => throw new IllegalArgumentException(s"unsupported container: $other")
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream, tpe, bos)
    bos.toByteArray
  }

  /** Deterministic pseudo-random-texture PNG: every pixel's gray level
    * is a splitmix64-style mix of (seed, x, y), so distinct seeds give
    * images whose dHashes are effectively independent 64-bit draws
    * (a solid fill like [[synthesizePng]] would dHash to 0 for EVERY
    * image — useless as a near-dup fixture). `format` picks the
    * container (png/bmp — both lossless in the JDK), so a fixture can
    * pair one scene under two codecs and the dHash must still match.
    */
  def synthesizePatternImage(width: Int, height: Int, seed: Long,
                             format: String = "png"): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate image ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        var v = seed * 0x9E3779B97F4A7C15L +
          x * 0xC2B2AE3D27D4EB4FL + y * 0x165667B19E3779F9L
        v ^= (v >>> 29); v *= 0xBF58476D1CE4E5B9L; v ^= (v >>> 32)
        val g = (v & 0xff).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Deterministic multi-frame animated GIF (one solid-gray frame per
    * `grays` entry) — the fixture generator for [[decodeFrames]]'s
    * value-checked gate entry, mirroring [[synthesizePng]].
    */
  def synthesizeGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate image ${width}x$height")
    require(grays.nonEmpty && grays.forall(g => g >= 0 && g <= 255),
      s"grays out of range: $grays")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    grays.foreach { g =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** REAL multi-frame decode for containers javax.imageio can demux —
    * animated GIF being the one video-adjacent format the JDK ships a
    * decoder for. Every `every`-th stored frame decodes to pixels;
    * width/height/brightness come from the DECODED frame (same bounded
    * ≤128×128 sample grid as [[decodeImage]]). Undecodable payloads
    * yield one `frame_ix = -1, brightness = -1` sentinel row — corrupt
    * media must stay visible, not vanish. General containers
    * (mp4/webm) still need an external demuxer; see [[sampleFrames]]
    * for that (stubbed) path.
    */
  def decodeFrames(media: Dataset[MediaRecord], every: Int = 1): Dataset[FrameFeatures] = {
    require(every >= 1, s"every must be >= 1: $every")
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      def sentinel(id: Long) = Seq(FrameFeatures(id, -1, 0, 0, -1.0))
      it.flatMap { m =>
        // decoder resources released in finally: a corrupt record midway
        // through reader.read(i) must not leak the native decoder or the
        // input stream in a long-running executor
        var iis: javax.imageio.stream.ImageInputStream = null
        var reader: javax.imageio.ImageReader = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.content))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) sentinel(m.media_id)
          else {
            reader = readers.next()
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val out = (0 until n by every).map { i =>
              val img = reader.read(i)
              val w = img.getWidth
              val h = img.getHeight
              val stepX = math.max(1, w / 128)
              val stepY = math.max(1, h / 128)
              var sum = 0.0
              var cnt = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                    (rgb & 0xff)) / (3.0 * 255.0)
                  cnt += 1
                  x += stepX
                }
                y += stepY
              }
              FrameFeatures(m.media_id, i, w, h,
                if (cnt == 0) 0.0 else sum / cnt)
            }
            out
          }
        } catch {
          case scala.util.control.NonFatal(_) => sentinel(m.media_id)
        } finally {
          if (reader != null) reader.dispose()
          if (iis != null)
            try iis.close()
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }

  /** Uniform frame sampling: one output row per sampled frame. Row
    * expansion happens executor-side (flatMap) — a 2-hour video never
    * exists as one driver object.
    *
    * ==== STUB ==== real impl for general containers: demux + seek via
    * ffmpeg per partition; here each "frame" is a content slice,
    * deterministic and testable. For JDK-decodable multi-frame media
    * (animated GIF) use [[decodeFrames]], which is REAL.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyMs: Long): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val dur = m.duration_ms.getOrElse(0L)
      val n = (dur / everyMs).toInt
      (0 until n).iterator.map { i =>
        val ts = i * everyMs
        // ---- STUB decode: slice bytes as a stand-in for a JPEG frame ----
        val sliceStart = if (m.content.isEmpty) 0 else (i * 16) % m.content.length
        val frame = m.content.slice(sliceStart, math.min(sliceStart + 16, m.content.length))
        // ---- end STUB ----
        FrameSample(m.media_id, i, ts, frame)
      }
    }
  }

  /** Media → embedding extraction, batch-per-partition: the step a
    * cross-modal retrieval pipeline runs before ANN indexing. Long
    * format (media_id, dim, value) so downstream ops and the oracle
    * need no array handling.
    *
    * ==== STUB ==== real implementation: an ONNX/vision encoder session
    * initialized ONCE per partition here, batched inference inside the
    * same mapPartitions body. Stand-in: a byte-frequency histogram over
    * byte values 97..97+dim-1 ('a'..) normalized by payload size —
    * deterministic, byte-level (exercises the real binary path), and
    * SQL-derivable so the gate value-checks the plumbing end-to-end.
    */
  def embedMedia(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaEmbeddingRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition encoder/session init would go here (once, not per row)
      it.flatMap { m =>
        val counts = new Array[Long](dim)
        val bytes = m.content
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) - 97
          if (b >= 0 && b < dim) counts(b) += 1
          i += 1
        }
        val n = math.max(1, bytes.length).toDouble
        (0 until dim).iterator.map(d => MediaEmbeddingRow(m.media_id, d, counts(d) / n))
      }
    }
  }

  /** Size-aware repartition before decode: target ~`targetMb` of binary
    * payload per task so one giant video doesn't starve a partition and
    * thousands of icons don't under-fill others. One cheap aggregate
    * action sizes the job (a single scalar to the driver — not a
    * collect of data), then a hash repartition spreads rows.
    */
  def repartitionBySize(media: DataFrame, binaryCol: String,
                        targetMb: Int): DataFrame = {
    // sum() is NULL on an empty input — read it as Option, default 0
    val totalBytes = Option(media
      .agg(sum(length(col(binaryCol)).cast("long"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val parts = math.max(1, (totalBytes / (targetMb.toLong * 1024 * 1024)).toInt)
    media.repartition(parts)
  }

}
