package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batched
  * per-partition passes — the Scala analog of the mapInPandas pattern
  * (arrow batches → vectorized decode).
  *
  * The IMAGE path is real: [[ImageCodec]] decodes PNG/JPEG/GIF/BMP via
  * the JDK's `javax.imageio` (no external dependency), reads actual
  * width/height/band-count, and extracts a deterministic 64-dim
  * grid-luminance embedding from the decoded pixels; real resize +
  * PNG re-encode runs through an offscreen `Graphics2D`. The AUDIO path
  * is real too: [[AudioCodec]] decodes WAV/AIFF/AU via the JDK's
  * `javax.sound.sampled`, converts to 16-bit PCM, and extracts a 64-bin
  * RMS energy envelope. The VIDEO path is real for MJPEG-in-AVI
  * ([[VideoCodec]] walks the RIFF container and decodes each frame as a
  * JPEG through ImageIO) AND for raw Y4M/YUV4MPEG2 ([[Y4mCodec]] parses
  * the stream header and converts planar YUV planes to RGB) — the two
  * video formats expressible with zero dependencies; compressed
  * inter-frame codecs (H.264 etc.) would need external bindings, so
  * payloads no real codec claims (including the text-bytes fixture
  * media) fall back to [[FakeCodec]]'s digest-derived stand-in.
  *
  * Scale notes: decode is the CPU hot spot, so [[decodeImages]]
  * repartitions by media_id to spread work across executors regardless
  * of upstream file layout, and processing runs per-partition
  * (mapPartitions — one codec init per task, not per row, exactly like
  * a pandas-UDF batch). ImageIO's tmp-file disk cache is disabled once
  * per executor JVM — per-row tmp writes would thrash task-local disk.
  */
object MediaOps {

  /** Opaque media row: content is the raw bytes, meta carries typed
    * sidecar fields (mime, source). */
  case class MediaFile(media_id: Long, kind: String, content: Array[Byte],
                       mime: String, source: String)

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           channels: Int, embedding: Array[Float])

  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Real in-JDK image codec (javax.imageio): decode, grid-luminance
    * features, resize, PNG re-encode. Everything is deterministic —
    * PNG/JPEG decoding and the sRGB conversion in `getRGB` are
    * pixel-exact functions of the payload. */
  object ImageCodec {
    // one-time per-JVM: ImageIO defaults to spooling streams through a
    // tmp-file cache, which per-row would hammer task-local disk
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode any format a registered ImageIO reader claims (PNG, JPEG,
      * GIF, BMP, WBMP in a stock JDK); None for unclaimed payloads. */
    def decode(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case _: java.io.IOException => None }

    /** 64-dim embedding: mean luminance over an 8×8 cell grid of the
      * decoded pixels (the classic perceptual-thumbnail feature),
      * normalized to [0,1] — same dim as the embeddings table, so the
      * ANN path applies unchanged. */
    def gridFeatures(img: java.awt.image.BufferedImage, grid: Int = 8): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](grid * grid)
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val x0 = gx * w / grid; val x1 = math.max(x0 + 1, (gx + 1) * w / grid)
          val y0 = gy * h / grid; val y1 = math.max(y0 + 1, (gy + 1) * h / grid)
          var sum = 0.0; var n = 0
          var y = y0
          while (y < h && y < y1) {
            var x = x0
            while (x < w && x < x1) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
              n += 1; x += 1
            }
            y += 1
          }
          out(gy * grid + gx) = if (n == 0) 0.0f else (sum / n).toFloat
          gx += 1
        }
        gy += 1
      }
      out
    }

    /** Bilinear resize through an offscreen Graphics2D (headless-safe). */
    def resize(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    /** Integer box-filter downsample by an exact factor: each output
      * pixel is `floor(Σ block / factor²)` per channel. Unlike the
      * bilinear [[resize]] (whose Graphics2D filter taps are
      * JVM-version-dependent), this is pure integer arithmetic — the
      * same value on every platform, and exactly replayable by an
      * external oracle. Width and height must be multiples of factor. */
    def boxDownsample(img: java.awt.image.BufferedImage, factor: Int): java.awt.image.BufferedImage = {
      require(factor > 0 && img.getWidth % factor == 0 && img.getHeight % factor == 0,
        s"boxDownsample: ${img.getWidth}x${img.getHeight} not divisible by $factor")
      val w = img.getWidth / factor
      val h = img.getHeight / factor
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val area = factor * factor
      var yo = 0
      while (yo < h) {
        var xo = 0
        while (xo < w) {
          var r = 0; var g = 0; var b = 0
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              val rgb = img.getRGB(xo * factor + dx, yo * factor + dy)
              r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
              dx += 1
            }
            dy += 1
          }
          out.setRGB(xo, yo, ((r / area) << 16) | ((g / area) << 8) | (b / area))
          xo += 1
        }
        yo += 1
      }
      out
    }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
  }

  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, embedding: Array[Float])

  /** Real in-JDK audio codec (javax.sound.sampled): decode WAV/AIFF/AU
    * payloads, convert to 16-bit signed PCM, and extract a 64-bin RMS
    * energy envelope — the audio analog of [[ImageCodec.gridFeatures]]
    * (same 64-dim shape, so the ANN path applies unchanged). Everything
    * is a deterministic function of the payload bytes. */
  object AudioCodec {

    /** Decoded PCM: (sampleRate, channels, 16-bit signed little-endian
      * frames); None when no installed provider claims the payload. */
    def decode(content: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val src = in.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val pcmIn = javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, in)
          try Some((src.getSampleRate.toInt, src.getChannels,
            pcmIn.readAllBytes()))
          finally pcmIn.close()
        } finally in.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
        case _: IllegalArgumentException => None // no conversion provider
      }

    /** Encode 16-bit signed mono samples as a REAL RIFF/WAVE payload via
      * the JDK's own writer — the container [[decode]] reads back
      * bit-exactly (PCM16 → PCM16 is a pass-through conversion), which
      * is what lets mm3 pin the audio codec chain against an integer
      * oracle. */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      try javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      finally in.close()
      out.toByteArray
    }

    /** 64-bin RMS energy envelope over the 16-bit mono-mixed samples,
      * normalized to [0,1] — the coarse loudness contour (silence → 0,
      * full-scale → 1). */
    def rmsEnvelope(pcm: Array[Byte], channels: Int, bins: Int = 64): Array[Float] = {
      val frameBytes = channels * 2
      val nFrames = pcm.length / frameBytes
      val out = new Array[Float](bins)
      if (nFrames == 0) return out
      var b = 0
      while (b < bins) {
        val f0 = b.toLong * nFrames / bins
        val f1 = math.max(f0 + 1, (b + 1).toLong * nFrames / bins)
        var sum = 0.0; var n = 0
        var f = f0
        while (f < nFrames && f < f1) {
          // mix channels to mono before the energy sum
          var c = 0; var acc = 0.0
          while (c < channels) {
            val i = (f * frameBytes + c * 2).toInt
            val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
            acc += s / 32768.0
            c += 1
          }
          val m = acc / channels
          sum += m * m; n += 1; f += 1
        }
        out(b) = if (n == 0) 0.0f else math.sqrt(sum / n).toFloat
        b += 1
      }
      out
    }

    /** Mono-mixed samples in [-1, 1] from 16-bit signed LE PCM. */
    def monoSamples(pcm: Array[Byte], channels: Int): Array[Double] = {
      val frameBytes = channels * 2
      val nFrames = pcm.length / frameBytes
      val out = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var c = 0; var acc = 0.0
        while (c < channels) {
          val i = f * frameBytes + c * 2
          acc += ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort / 32768.0
          c += 1
        }
        out(f) = acc / channels
        f += 1
      }
      out
    }

    /** In-place iterative radix-2 Cooley–Tukey FFT (decimation in time,
      * bit-reversal permutation first). Pure JDK, deterministic; length
      * must be a power of two. O(n log n), zero allocation beyond the
      * caller's two arrays — this runs per spectrogram frame inside a
      * mapPartitions batch, so allocation discipline matters. */
    def fft(re: Array[Double], im: Array[Double]): Unit = {
      val n = re.length
      require(n > 0 && (n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
      var i = 1; var j = 0
      while (i < n) {
        var bit = n >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (i < j) {
          val tr = re(i); re(i) = re(j); re(j) = tr
          val ti = im(i); im(i) = im(j); im(j) = ti
        }
        i += 1
      }
      var len = 2
      while (len <= n) {
        val half = len >> 1
        val ang = -2 * math.Pi / len
        val wr = math.cos(ang); val wi = math.sin(ang)
        var base = 0
        while (base < n) {
          var cr = 1.0; var ci = 0.0
          var k = 0
          while (k < half) {
            val ur = re(base + k); val ui = im(base + k)
            val xr = re(base + k + half); val xi = im(base + k + half)
            val vr = xr * cr - xi * ci
            val vi = xr * ci + xi * cr
            re(base + k) = ur + vr; im(base + k) = ui + vi
            re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
            val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
            k += 1
          }
          base += len
        }
        len <<= 1
      }
    }

    /** Hann-windowed magnitude spectrogram over the mono mix: one row per
      * analysis frame, `frameSize/2 + 1` bins per row (DC..Nyquist).
      * Clips shorter than one frame are zero-padded to a single frame. */
    def spectrogram(samples: Array[Double], frameSize: Int = 512,
                    hop: Int = 256): Array[Array[Double]] = {
      require(frameSize > 0 && (frameSize & (frameSize - 1)) == 0,
        s"frame size must be a power of two, got $frameSize")
      val nFrames = math.max(1, (samples.length - frameSize) / hop + 1)
      val nBins = frameSize / 2 + 1
      val window = Array.tabulate(frameSize)(i =>
        0.5 * (1 - math.cos(2 * math.Pi * i / (frameSize - 1))))
      val out = new Array[Array[Double]](nFrames)
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var f = 0
      while (f < nFrames) {
        val off = f * hop
        var i = 0
        while (i < frameSize) {
          re(i) = if (off + i < samples.length) samples(off + i) * window(i) else 0.0
          im(i) = 0.0
          i += 1
        }
        fft(re, im)
        val mags = new Array[Double](nBins)
        var b = 0
        while (b < nBins) {
          mags(b) = math.sqrt(re(b) * re(b) + im(b) * im(b))
          b += 1
        }
        out(f) = mags
        f += 1
      }
      out
    }

    /** Mean magnitude spectrum across frames (the clip's long-term
      * average spectrum). */
    def meanSpectrum(spec: Array[Array[Double]]): Array[Double] = {
      val nBins = spec(0).length
      val out = new Array[Double](nBins)
      spec.foreach { row =>
        var b = 0
        while (b < nBins) { out(b) += row(b); b += 1 }
      }
      var b = 0
      while (b < nBins) { out(b) /= spec.length; b += 1 }
      out
    }

    /** Dominant frequency in Hz: argmax bin of the mean spectrum,
      * DC excluded (ties break to the lowest bin). 0.0 for silence. */
    def dominantHz(mean: Array[Double], sampleRate: Int, frameSize: Int): Double = {
      var best = 1; var b = 2
      while (b < mean.length) {
        if (mean(b) > mean(best)) best = b
        b += 1
      }
      if (mean(best) <= 0.0) 0.0 else best.toDouble * sampleRate / frameSize
    }

    /** Spectral centroid in Hz (magnitude-weighted mean frequency);
      * 0.0 for silence. */
    def centroidHz(mean: Array[Double], sampleRate: Int, frameSize: Int): Double = {
      var num = 0.0; var den = 0.0
      var b = 0
      while (b < mean.length) {
        num += b.toDouble * sampleRate / frameSize * mean(b)
        den += mean(b)
        b += 1
      }
      if (den <= 0.0) 0.0 else num / den
    }

    private def hzToMel(f: Double): Double = 2595.0 * math.log10(1 + f / 700.0)
    private def melToHz(m: Double): Double = 700.0 * (math.pow(10, m / 2595.0) - 1)

    /** MFCC-lite clip embedding: triangular mel filterbank (HTK-style
      * mel scale) over the mean magnitude spectrum → log energies →
      * DCT-II → first `nCoeffs` cepstral coefficients. One vector per
      * clip (computed on the long-term average spectrum rather than
      * per-frame, which is the right cost shape for corpus-scale audio
      * fingerprinting: O(frames · n log n) decode, O(1) output). */
    def mfccLite(mean: Array[Double], sampleRate: Int, frameSize: Int,
                 nMels: Int = 26, nCoeffs: Int = 13): Array[Float] = {
      val nBins = mean.length
      val melMax = hzToMel(sampleRate / 2.0)
      // nMels + 2 mel-spaced edge points → nMels triangular filters
      val edges = Array.tabulate(nMels + 2)(i =>
        melToHz(melMax * i / (nMels + 1)) * frameSize / sampleRate)
      val energies = new Array[Double](nMels)
      var m = 0
      while (m < nMels) {
        val lo = edges(m); val mid = edges(m + 1); val hi = edges(m + 2)
        var e = 0.0
        var b = math.max(1, math.ceil(lo).toInt)
        while (b < nBins && b < hi) {
          val w =
            if (b <= mid) (b - lo) / math.max(mid - lo, 1e-12)
            else (hi - b) / math.max(hi - mid, 1e-12)
          if (w > 0) e += w * mean(b)
          b += 1
        }
        energies(m) = math.log(math.max(e, 1e-12))
        m += 1
      }
      val out = new Array[Float](nCoeffs)
      var k = 0
      while (k < nCoeffs) {
        var s = 0.0
        var i = 0
        while (i < nMels) {
          s += energies(i) * math.cos(math.Pi * k * (i + 0.5) / nMels)
          i += 1
        }
        out(k) = s.toFloat
        k += 1
      }
      out
    }
  }

  /** Batched audio decode + feature extraction: real javax.sound decode
    * (actual sample rate/channels/frame count + RMS envelope), digest
    * fallback for payloads no provider claims — same per-partition batch
    * shape as [[decodeImages]]. */
  def decodeAudio(media: Dataset[MediaFile], parallelism: Int): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .repartition(parallelism, col("media_id"))
      .mapPartitions { batch =>
        batch.map { m =>
          AudioCodec.decode(m.content) match {
            case Some((rate, ch, pcm)) =>
              AudioFeatures(m.media_id, rate, ch, pcm.length / (ch * 2L),
                AudioCodec.rmsEnvelope(pcm, ch))
            case None =>
              val (w, h, c) = FakeCodec.imageDims(m.content)
              AudioFeatures(m.media_id, 8000, 1, (w * h).toLong,
                FakeCodec.features(m.content))
          }
        }
      }
  }

  case class AudioSpectral(media_id: Long, sample_rate: Int, n_frames: Long,
                           dominant_hz: Double, centroid_hz: Double,
                           mfcc: Array[Float])

  /** Batched audio spectral analysis: decode → mono mix → Hann/FFT
    * spectrogram → mean spectrum → (dominant Hz, spectral centroid,
    * MFCC-lite coefficients). Same per-partition batch shape as
    * [[decodeAudio]]; payloads no provider claims fall back to the
    * digest stand-in (13-dim slice of [[FakeCodec.features]], 0.0 Hz
    * markers) so the pipeline stays total. */
  def decodeAudioSpectral(media: Dataset[MediaFile], parallelism: Int,
                          frameSize: Int = 512, hop: Int = 256): Dataset[AudioSpectral] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .repartition(parallelism, col("media_id"))
      .mapPartitions { batch =>
        batch.map { m =>
          AudioCodec.decode(m.content) match {
            case Some((rate, ch, pcm)) =>
              val mono = AudioCodec.monoSamples(pcm, ch)
              val spec = AudioCodec.spectrogram(mono, frameSize, hop)
              val mean = AudioCodec.meanSpectrum(spec)
              AudioSpectral(m.media_id, rate, mono.length.toLong,
                AudioCodec.dominantHz(mean, rate, frameSize),
                AudioCodec.centroidHz(mean, rate, frameSize),
                AudioCodec.mfccLite(mean, rate, frameSize))
            case None =>
              val (w, h, _) = FakeCodec.imageDims(m.content)
              AudioSpectral(m.media_id, 8000, (w * h).toLong, 0.0, 0.0,
                FakeCodec.features(m.content).take(13))
          }
        }
      }
  }

  case class VideoFeatures(media_id: Long, width: Int, height: Int,
                           n_frames: Long, embedding: Array[Float])

  /** Real in-JDK video codec for MJPEG-in-AVI — the one video container
    * expressible with zero dependencies, because every frame is a plain
    * JPEG the JDK's ImageIO already decodes. The reader is a RIFF chunk
    * walker: verify `RIFF....AVI `, recurse through `LIST`s, read
    * `avih` for (width, height, µs/frame), and collect every `##dc` /
    * `##db` chunk in the `movi` list as one JPEG frame payload. The
    * writer emits a well-formed minimal AVI (avih + strl(vids/MJPG) +
    * movi) so round-trip fixtures are real container bytes, not
    * hand-waved blobs. Anything that is not an MJPEG AVI (other codecs
    * need bindings this container cannot ship) falls back to
    * [[FakeCodec]] exactly as before. */
  object VideoCodec {
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Parsed clip: per-frame JPEG payloads in container order. */
    case class AviVideo(width: Int, height: Int, microSecPerFrame: Int,
                        frames: Vector[Array[Byte]])

    /** None for anything that is not a parseable MJPEG AVI (wrong magic,
      * corrupt chunk sizes, zero frames, undecodable first frame when
      * the header omits dimensions). */
    def decode(content: Array[Byte]): Option[AviVideo] =
      try {
        if (content.length < 12 || fourcc(content, 0) != "RIFF" ||
            fourcc(content, 8) != "AVI ") return None
        var width = 0; var height = 0; var mspf = 0
        val frames = Vector.newBuilder[Array[Byte]]
        def walk(start: Int, end: Int): Unit = {
          var o = start
          while (o + 8 <= end) {
            val id = fourcc(content, o)
            val sz = le32(content, o + 4)
            val body = o + 8
            if (sz < 0 || body + sz > end) return // corrupt size — stop
            if (id == "LIST" && sz >= 4) walk(body + 4, body + sz)
            else if (id == "avih" && sz >= 40) {
              mspf = le32(content, body)
              width = le32(content, body + 32)
              height = le32(content, body + 36)
            } else if (sz > 0 && id.charAt(2) == 'd' &&
                (id.charAt(3) == 'c' || id.charAt(3) == 'b')) {
              frames += java.util.Arrays.copyOfRange(content, body, body + sz)
            }
            o = body + sz + (sz & 1) // chunks are word-aligned
          }
        }
        walk(12, content.length)
        val fs = frames.result()
        if (fs.isEmpty) None
        else if (width > 0 && height > 0) Some(AviVideo(width, height, mspf, fs))
        else ImageCodec.decode(fs.head) // headerless: dims off frame 0
          .map(img => AviVideo(img.getWidth, img.getHeight, mspf, fs))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Encode frames as an MJPEG AVI (JPEG per frame via ImageIO). All
      * frames share the first frame's dimensions per the AVI contract. */
    def encodeAvi(frames: Seq[java.awt.image.BufferedImage],
                  microSecPerFrame: Int = 40000): Array[Byte] = {
      require(frames.nonEmpty, "cannot encode an empty video")
      def i32(v: Int): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
      def i16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def cc(s: String): Array[Byte] =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        cc(id) ++ i32(body.length) ++ body ++
          (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
      def list(typ: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", cc(typ) ++ body)
      val jpegs = frames.map { img =>
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", baos)
        baos.toByteArray
      }
      val w = frames.head.getWidth; val h = frames.head.getHeight
      val avih = chunk("avih",
        i32(microSecPerFrame) ++ i32(0) ++ i32(0) ++ i32(0x10) ++
          i32(jpegs.size) ++ i32(0) ++ i32(1) ++ i32(0) ++
          i32(w) ++ i32(h) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0))
      val strh = chunk("strh",
        cc("vids") ++ cc("MJPG") ++ i32(0) ++ i16(0) ++ i16(0) ++ i32(0) ++
          i32(microSecPerFrame) ++ i32(1000000) ++ i32(0) ++ i32(jpegs.size) ++
          i32(0) ++ i32(-1) ++ i32(0) ++
          i16(0) ++ i16(0) ++ i16(w) ++ i16(h))
      val strf = chunk("strf",
        i32(40) ++ i32(w) ++ i32(h) ++ i32(1 | (24 << 16)) ++ cc("MJPG") ++
          i32(w * h * 3) ++ i32(0) ++ i32(0) ++ i32(0) ++ i32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
      val payload = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ i32(payload.length) ++ payload
    }
  }

  /** Real in-JDK codec for Y4M (YUV4MPEG2) — raw uncompressed video, the
    * interchange format every video toolchain (ffmpeg, x264/x265 input,
    * mjpegtools) reads and writes: an ASCII stream header
    * (`YUV4MPEG2 W<w> H<h> F<num>:<den> … C<colorspace>\n`) followed by
    * frames, each a `FRAME…\n` marker line plus raw PLANAR YUV data
    * (Y plane, then the subsampled U and V planes). Supported
    * colorspaces: the 4:2:0 family (`C420jpeg`/`C420mpeg2`/`C420paldv`/
    * `C420`), `C422`, `C444`, and `Cmono`; anything else returns None
    * (→ [[FakeCodec]]). YUV→RGB uses the full-range BT.601 (JPEG)
    * matrix for ALL variants and ignores chroma siting differences
    * between the 4:2:0 sub-variants — a documented simplification that
    * shifts chroma by at most half a sample, irrelevant to the
    * grid-luminance features downstream (luminance is carried verbatim).
    * The writer emits spec-shaped streams (RGB→YUV with 2×2 chroma
    * averaging for 4:2:0) so round-trip fixtures are real container
    * bytes — C444/mono round-trip luma-exactly, pinned by spec. */
  object Y4mCodec {
    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

    /** Parsed clip: decoded frames plus stream metadata. */
    case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                        colorspace: String,
                        frames: Vector[java.awt.image.BufferedImage])

    private def clamp(v: Double): Int =
      math.max(0, math.min(255, math.round(v).toInt))

    /** Chroma plane dimensions for a colorspace, None if unsupported.
      * EXACT names only: a prefix match would claim 10/16-bit variants
      * (`420p10`, `444p16`) with 8-bit plane sizes and walk wrong frame
      * offsets — usually caught by the FRAME resync, but a short stream
      * could silently decode garbage instead of falling to FakeCodec. */
    private def chromaDims(cs: String, w: Int, h: Int): Option[(Int, Int)] =
      cs match {
        case "420jpeg" | "420mpeg2" | "420paldv" | "420" =>
          Some(((w + 1) / 2, (h + 1) / 2))
        case "422"  => Some(((w + 1) / 2, h))
        case "444"  => Some((w, h))
        case "mono" => Some((0, 0))
        case _      => None
      }

    /** None for anything that is not a parseable YUV4MPEG2 stream in the
      * supported colorspace set (wrong magic, malformed header, truncated
      * frame data, zero frames). */
    def decode(content: Array[Byte]): Option[Y4mVideo] =
      try {
        val magic = "YUV4MPEG2"
        if (content.length < magic.length + 1 ||
            !magic.indices.forall(i => content(i) == magic.charAt(i).toByte))
          return None
        def lineEnd(from: Int): Int = {
          var i = from
          while (i < content.length && content(i) != 0x0a) i += 1
          i
        }
        val hEnd = lineEnd(magic.length)
        if (hEnd >= content.length) return None
        var w = 0; var h = 0; var fn = 25; var fd = 1; var cs = "420jpeg"
        new String(content, magic.length, hEnd - magic.length, Ascii)
          .split(" ").filter(_.nonEmpty).foreach { p =>
            p.charAt(0) match {
              case 'W' => w = p.substring(1).toInt
              case 'H' => h = p.substring(1).toInt
              case 'F' =>
                val parts = p.substring(1).split(":")
                fn = parts(0).toInt; fd = parts(1).toInt
              case 'C' => cs = p.substring(1)
              case _ => () // I (interlace), A (aspect), X (comment)
            }
          }
        if (w <= 0 || h <= 0) return None
        val (cw, ch) = chromaDims(cs, w, h).getOrElse(return None)
        val frameBytes = w * h + 2 * cw * ch
        val frames = Vector.newBuilder[java.awt.image.BufferedImage]
        var o = hEnd + 1
        while (o < content.length) {
          if (o + 5 > content.length ||
              new String(content, o, 5, Ascii) != "FRAME") return None
          o = lineEnd(o) + 1
          if (o + frameBytes > content.length) return None
          frames += frameToImage(content, o, w, h, cw, ch, cs)
          o += frameBytes
        }
        val fs = frames.result()
        if (fs.isEmpty) None else Some(Y4mVideo(w, h, fn, fd, cs, fs))
      } catch { case scala.util.control.NonFatal(_) => None }

    private def frameToImage(b: Array[Byte], off: Int, w: Int, h: Int,
                             cw: Int, ch: Int, cs: String): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val uOff = off + w * h
      val vOff = uOff + cw * ch
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yd = b(off + y * w + x) & 0xff
          val (ud, vd) =
            if (cs == "mono") (0, 0)
            else {
              val ci =
                if (cs.startsWith("420")) (y / 2) * cw + x / 2
                else if (cs.startsWith("422")) y * cw + x / 2
                else y * cw + x // 444
              ((b(uOff + ci) & 0xff) - 128, (b(vOff + ci) & 0xff) - 128)
            }
          val r = clamp(yd + 1.402 * vd)
          val g = clamp(yd - 0.344136 * ud - 0.714136 * vd)
          val bl = clamp(yd + 1.772 * ud)
          img.setRGB(x, y, (r << 16) | (g << 8) | bl)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Encode frames as a YUV4MPEG2 stream. All frames share the first
      * frame's dimensions (the stream header fixes them). 4:2:0 chroma
      * is the mean of each 2×2 block's per-pixel chroma (the standard
      * downsample); C444 and Cmono carry luma losslessly. */
    def encodeY4m(frames: Seq[java.awt.image.BufferedImage],
                  colorspace: String = "420jpeg",
                  fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
      require(frames.nonEmpty, "cannot encode an empty video")
      val w = frames.head.getWidth; val h = frames.head.getHeight
      val (cw, ch) = chromaDims(colorspace, w, h).getOrElse(
        sys.error(s"unsupported y4m colorspace $colorspace"))
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C$colorspace\n"
        .getBytes(Ascii))
      frames.foreach { img =>
        out.write("FRAME\n".getBytes(Ascii))
        val yP = new Array[Byte](w * h)
        val uP = Array.fill(cw * ch)(0.0)
        val vP = Array.fill(cw * ch)(0.0)
        val nP = Array.fill(cw * ch)(0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            yP(y * w + x) = clamp(0.299 * r + 0.587 * g + 0.114 * b).toByte
            if (colorspace != "mono") {
              val ci =
                if (colorspace.startsWith("420")) (y / 2) * cw + x / 2
                else if (colorspace.startsWith("422")) y * cw + x / 2
                else y * cw + x
              uP(ci) += 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
              vP(ci) += 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
              nP(ci) += 1
            }
            x += 1
          }
          y += 1
        }
        out.write(yP)
        if (colorspace != "mono") {
          val u8 = new Array[Byte](cw * ch)
          val v8 = new Array[Byte](cw * ch)
          var i = 0
          while (i < cw * ch) {
            u8(i) = clamp(uP(i) / math.max(nP(i), 1)).toByte
            v8(i) = clamp(vP(i) / math.max(nP(i), 1)).toByte
            i += 1
          }
          out.write(u8); out.write(v8)
        }
      }
      out.toByteArray
    }
  }

  /** Batched video decode + feature extraction: REAL MJPEG-in-AVI parse
    * (RIFF walk → per-frame JPEG decode) and REAL Y4M parse (planar YUV
    * → RGB) with the per-frame
    * grid-luminance features averaged into one clip embedding — same
    * 64-dim shape as the image/audio paths, so the ANN path applies
    * unchanged; digest fallback for payloads neither codec claims.
    * Same per-partition batch shape as [[decodeImages]]. */
  /** Per-dimension mean of the per-frame feature vectors (the clip
    * embedding both real video codecs share). */
  private def meanEmbedding(perFrame: Seq[Array[Float]]): Array[Float] = {
    val emb = new Array[Float](64)
    if (perFrame.nonEmpty) {
      var i = 0
      while (i < emb.length) {
        var s = 0.0
        perFrame.foreach(a => s += a(i))
        emb(i) = (s / perFrame.size).toFloat
        i += 1
      }
    }
    emb
  }

  def decodeVideos(media: Dataset[MediaFile], parallelism: Int): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .repartition(parallelism, col("media_id"))
      .mapPartitions { batch =>
        batch.map { m =>
          VideoCodec.decode(m.content) match {
            case Some(v) =>
              val perFrame = v.frames.flatMap(f =>
                ImageCodec.decode(f).map(img => ImageCodec.gridFeatures(img)))
              VideoFeatures(m.media_id, v.width, v.height, v.frames.size.toLong,
                meanEmbedding(perFrame))
            case None => Y4mCodec.decode(m.content) match {
              case Some(v) =>
                VideoFeatures(m.media_id, v.width, v.height, v.frames.size.toLong,
                  meanEmbedding(v.frames.map(ImageCodec.gridFeatures(_))))
              case None =>
                val (w, h, _) = FakeCodec.imageDims(m.content)
                VideoFeatures(m.media_id, w, h,
                  FakeCodec.frameCount(m.content).toLong,
                  FakeCodec.features(m.content))
            }
          }
        }
      }
  }

  /** ======== STUB CODEC (undecodable-payload fallback) ========
    * Deterministic fake for payloads no real codec claims — images no
    * ImageIO reader accepts, audio no sampled provider accepts, and
    * video that is neither MJPEG-in-AVI nor Y4M (compressed inter-frame
    * codecs need external bindings). The real paths are [[ImageCodec]],
    * [[AudioCodec]], [[VideoCodec]], and [[Y4mCodec]]. */
  object FakeCodec {
    private def digest(b: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(b)

    /** "Decode" dimensions from content bytes. */
    def imageDims(content: Array[Byte]): (Int, Int, Int) = {
      val d = digest(content)
      (64 + (d(0) & 0x7f), 64 + (d(1) & 0x7f), 1 + (d(2) & 0x03))
    }

    /** "Feature-extract" a 64-dim embedding from content bytes (matches
      * the embeddings table dim, so the ANN path applies unchanged). */
    def features(content: Array[Byte]): Array[Float] =
      (0 until 4).flatMap(i => digest(content :+ i.toByte))
        .map(b => (b & 0xff) / 255.0f).toArray

    /** "Probe" the frame count of a video payload. */
    def frameCount(content: Array[Byte]): Int =
      2 + (digest(content)(3) & 0x07)
  }

  /** Synthesize a media table from the documents fixture (binary column
    * = utf-8 bytes; real pipelines read binaryFile/parquet blobs). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "video")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("image").as("kind"),
        col("text").cast("binary").as("content"),
        lit("application/octet-stream").as("mime"),
        col("source"))
      .as[MediaFile]
  }

  /** Batched image decode + feature extraction: real ImageIO decode
    * (actual width/height/bands + pixel-derived grid features), digest
    * fallback for payloads no reader claims. Runs per-partition so codec
    * setup happens once per task, rows stream as an iterator (never
    * materialized per-task). */
  def decodeImages(media: Dataset[MediaFile], parallelism: Int): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .repartition(parallelism, col("media_id"))
      .mapPartitions { batch =>
        batch.map { m =>
          ImageCodec.decode(m.content) match {
            case Some(img) =>
              ImageFeatures(m.media_id, img.getWidth, img.getHeight,
                img.getRaster.getNumBands, ImageCodec.gridFeatures(img))
            case None =>
              val (w, h, c) = FakeCodec.imageDims(m.content)
              ImageFeatures(m.media_id, w, h, c, FakeCodec.features(m.content))
          }
        }
      }
  }

  /** Resize: real bilinear scale + PNG re-encode for decodable images;
    * undecodable payloads keep their bytes and get the metadata tag only.
    * Both paths preserve the opaque-binary shape so downstream stages
    * stay codec-agnostic. */
  def resizeImages(media: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else ImageCodec.decode(m.content) match {
        case Some(img) =>
          m.copy(content = ImageCodec.encodePng(ImageCodec.resize(img, w, h)),
            mime = s"image/png; resized=${w}x$h")
        case None => m.copy(mime = s"${m.mime}; resized=${w}x$h")
      }
    }
  }

  /** Frame sampling: one row per kept frame (flatMap = the generator
    * shape; output cardinality is data-dependent, never collected).
    * MJPEG AVIs yield their ACTUAL frame payloads (each a standalone
    * JPEG any downstream image stage decodes); Y4M streams yield kept
    * frames PNG-re-encoded (same standalone-image contract — raw planar
    * slices would be opaque to the image stages); payloads neither codec
    * claims fall back to the digest stand-in. */
  def sampleFrames(media: Dataset[MediaFile], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      VideoCodec.decode(m.content) match {
        case Some(v) =>
          (0 until v.frames.size by everyN).map(i => Frame(m.media_id, i, v.frames(i)))
        case None => Y4mCodec.decode(m.content) match {
          case Some(v) =>
            (0 until v.frames.size by everyN).map(i =>
              Frame(m.media_id, i, ImageCodec.encodePng(v.frames(i))))
          case None =>
            val n = FakeCodec.frameCount(m.content)
            (0 until n by everyN).map { i =>
              Frame(m.media_id, i, MessageDigest.getInstance("MD5")
                .digest(m.content ++ Array(i.toByte)))
            }
        }
      }
    }
  }

  /** Feature table ready for the ANN path: media embeddings in the same
    * (id, embedding) shape as the embeddings table, so
    * `operators.AnnSearch` applies unchanged. */
  def toEmbeddingTable(feats: Dataset[ImageFeatures]): DataFrame =
    feats.toDF().select(col("media_id").as("vec_id"), col("embedding"))

  /** The mm1/mm2/mm3 bridges index `bytes(i % bytes.length)` and the
    * oracle replays `ord(substr(text, i % length(text) + 1))` — the two
    * agree ONLY for non-empty pure-ASCII text: empty text is an
    * ArithmeticException (mod by zero), and a non-ASCII character is
    * encoded as '?' (63) by US_ASCII while DuckDB sees the codepoint
    * (and `length(text)` counts CHARS where the byte walk counts
    * BYTES), silently diverging the sums. Fails loudly per doc instead
    * — the bridge's contract is bit-exactness, and a silent '?'
    * substitution is exactly the drift it exists to catch. */
  private def asciiBytes(docId: Long, text: String): Array[Byte] = {
    if (text == null || text.isEmpty)
      sys.error(s"media bridge: doc $docId has empty text — the byte-tile " +
        "window is undefined (and the oracle's i % len is a div by zero)")
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) >= 128)
        sys.error(s"media bridge: doc $docId has non-ASCII char " +
          s"U+${text.charAt(i).toInt.toHexString} at $i — US_ASCII would " +
          "encode it as '?' while the oracle replays the codepoint")
      i += 1
    }
    text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  // mm1 clip geometry — shared by the Spark side and the oracle text
  private val MmDocs = 40L  // documents rendered to video (exists at every sf)
  private val MmW = 16
  private val MmH = 12
  private val MmF = 3       // frames per clip

  /** mm1: the multimodal tier's first ORACLE-checkable row — a
    * deterministic bridge between real container decode and a DuckDB
    * oracle that cannot decode media. Each document (doc_id < $MmDocs)
    * is rendered to a ${MmF}-frame ${MmW}×${MmH} GRAY clip whose pixel
    * values are the doc's ASCII text bytes tiled in raster order, the
    * frames are encoded into a REAL YUV4MPEG2 container
    * ([[Y4mCodec.encodeY4m]], Cmono) and decoded back through the full
    * parser ([[Y4mCodec.decode]] — header parse, frame walk, YUV→RGB),
    * and the query emits each decoded frame's luma sum plus the
    * header-parsed dimensions. Gray pixels round-trip BIT-EXACTLY
    * through mono Y4M (Y = 0.299v+0.587v+0.114v rounds to v; decode
    * adds zero chroma), so the oracle replays the luma sums from the
    * text bytes with integer arithmetic — if the container writer,
    * header parser, frame offsets, or YUV matrix drift by one bit, the
    * sums diverge and the row goes red. Scale shape: one row per
    * (doc, frame), synthesis+decode per-partition (the mapInPandas
    * batch pattern), nothing collected. */
  def mm1VideoLuma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.flatMap { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val frames = (0 until MmF).map { f =>
          val img = new java.awt.image.BufferedImage(MmW, MmH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < MmW * MmH) {
            val v = bytes((f * MmW * MmH + i) % bytes.length) & 0xff
            img.setRGB(i % MmW, i / MmW, (v << 16) | (v << 8) | v)
            i += 1
          }
          img
        }
        val container = Y4mCodec.encodeY4m(frames, "mono") // REAL bytes
        val v = Y4mCodec.decode(container).getOrElse(
          sys.error(s"mm1: container round-trip failed for doc $docId"))
        v.frames.zipWithIndex.map { case (img, f) =>
          var sum = 0L
          var y = 0
          while (y < v.height) {
            var x = 0
            while (x < v.width) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          (docId, f, v.width, v.height, sum)
        }
      }
    }.toDF("doc_id", "frame_no", "w", "h", "luma_sum")
      .orderBy("doc_id", "frame_no")
  }

  private val mm1Sql: String = {
    val px = MmW * MmH
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |fr AS (SELECT CAST(f AS INTEGER) AS frame_no FROM range($MmF) t(f)),
       |px AS (SELECT CAST(i AS BIGINT) AS i FROM range($px) t(i)),
       |v AS (
       |  SELECT d.doc_id, fr.frame_no,
       |    ord(substr(d.text,
       |      CAST((fr.frame_no * $px + px.i) % d.len AS INTEGER) + 1, 1)) AS v
       |  FROM d CROSS JOIN fr CROSS JOIN px)
       |SELECT doc_id, frame_no, CAST($MmW AS INTEGER) AS w,
       |  CAST($MmH AS INTEGER) AS h, CAST(SUM(v) AS BIGINT) AS luma_sum
       |FROM v GROUP BY doc_id, frame_no
       |ORDER BY doc_id, frame_no""".stripMargin
  }

  // mm2 image geometry (one frame, distinct from mm1's clip geometry)
  private val Mm2W = 24
  private val Mm2H = 16

  /** mm2: mm1's bridge for the IMAGE path — each small document's ASCII
    * bytes tile a ${Mm2W}×${Mm2H} gray image, the image round-trips
    * through a REAL PNG encode ([[ImageCodec.encodePng]], the JDK
    * writer) and the REAL ImageIO decode ([[ImageCodec.decode]]), and
    * the query emits the decoded luma sum. PNG is lossless, so the
    * oracle replays the sum from text bytes — the PNG writer, the
    * signature sniffing, the IDAT inflate, and `getRGB`'s sRGB path are
    * all inside the checked loop. */
  def mm2ImageLuma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val img = new java.awt.image.BufferedImage(Mm2W, Mm2H,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < Mm2W * Mm2H) {
          val v = bytes(i % bytes.length) & 0xff
          img.setRGB(i % Mm2W, i / Mm2W, (v << 16) | (v << 8) | v)
          i += 1
        }
        val png = ImageCodec.encodePng(img) // REAL container bytes
        val back = ImageCodec.decode(png).getOrElse(
          sys.error(s"mm2: PNG round-trip failed for doc $docId"))
        var sum = 0L
        var y = 0
        while (y < back.getHeight) {
          var x = 0
          while (x < back.getWidth) { sum += back.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        (docId, back.getWidth, back.getHeight, sum)
      }
    }.toDF("doc_id", "w", "h", "luma_sum")
      .orderBy("doc_id")
  }

  private val mm2Sql: String = {
    val px = Mm2W * Mm2H
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |px AS (SELECT CAST(i AS BIGINT) AS i FROM range($px) t(i))
       |SELECT doc_id, CAST($Mm2W AS INTEGER) AS w, CAST($Mm2H AS INTEGER) AS h,
       |  CAST(SUM(ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))) AS BIGINT)
       |    AS luma_sum
       |FROM d CROSS JOIN px
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // mm3 audio geometry
  private val Mm3Samples = 480
  private val Mm3Rate = 8000

  /** mm3: the bridge for the AUDIO path — each small document's ASCII
    * bytes become $Mm3Samples 16-bit mono samples (`(b − 128) · 256`),
    * encoded as a REAL RIFF/WAVE payload by the JDK writer
    * ([[AudioCodec.encodeWav]]) and decoded back through the full
    * javax.sound chain ([[AudioCodec.decode]] — container parse, PCM
    * conversion). PCM16 → PCM16 is a pass-through, so the decoded
    * stream is bit-exact and the oracle replays the absolute-sample
    * sum, the decoded frame count, and the header's sample rate with
    * integer arithmetic. */
  def mm3AudioSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val samples = Array.tabulate(Mm3Samples)(i =>
          (((bytes(i % bytes.length) & 0xff) - 128) * 256).toShort)
        val wav = AudioCodec.encodeWav(samples, Mm3Rate) // REAL bytes
        val (rate, channels, pcm) = AudioCodec.decode(wav).getOrElse(
          sys.error(s"mm3: WAV round-trip failed for doc $docId"))
        var sum = 0L
        var i = 0
        while (i < pcm.length) {
          val s16 = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
          sum += math.abs(s16.toLong)
          i += 2
        }
        (docId, rate, channels, (pcm.length / 2).toLong, sum)
      }
    }.toDF("doc_id", "sample_rate", "channels", "n_samples", "abs_sum")
      .orderBy("doc_id")
  }

  private val mm3Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |sm AS (SELECT CAST(i AS BIGINT) AS i FROM range($Mm3Samples) t(i))
       |SELECT doc_id, CAST($Mm3Rate AS INTEGER) AS sample_rate,
       |  CAST(1 AS INTEGER) AS channels,
       |  CAST($Mm3Samples AS BIGINT) AS n_samples,
       |  CAST(SUM(ABS((ord(substr(text, CAST(i % len AS INTEGER) + 1, 1)) - 128) * 256))
       |    AS BIGINT) AS abs_sum
       |FROM d CROSS JOIN sm
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // mm4 audio-FEATURE geometry. The sample mapping recenters on 64
  // (not mm3's 128) so ASCII bytes produce BOTH signs and the
  // zero-crossing feature genuinely moves.
  private val Mm4Samples = 480
  private val Mm4Rate = 8000

  /** mm4: the audio FEATURE tier's oracle row — mm3 stops at decode
    * arithmetic; this extracts three features from the decoded PCM16
    * stream, each chosen to be EXACTLY replayable by DuckDB in integer
    * arithmetic (a float FFT never is):
    *
    *   - `zero_crossings`: count of consecutive-sample sign changes
    *     (sign convention pinned as `x < 0`);
    *   - `energy`: Σ x² over the clip;
    *   - `g_power`: a Goertzel single-bin power at rate/6 — THE pinned
    *     frequency, because 2·cos(2π/6) = 1 makes the Goertzel
    *     recurrence sₙ = xₙ + sₙ₋₁ − sₙ₋₂ coefficient-free and the whole
    *     filter (and its power s₁² + s₂² − s₁·s₂) runs in BIGINT on
    *     both sides; the oracle replays the recurrence with a recursive
    *     CTE. |sₙ| ≤ N·32768 ≈ 1.6e7, so the squares fit comfortably.
    *
    * The Spark side starts from REAL RIFF-WAVE container bytes: render
    * text → PCM16 → [[AudioCodec.encodeWav]] → [[AudioCodec.decode]]
    * (full container parse) → features, so any one-bit drift in the
    * writer, header parse, or PCM conversion shows up as a red row. */
  def mm4AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val samples = Array.tabulate(Mm4Samples)(i =>
          (((bytes(i % bytes.length) & 0xff) - 64) * 256).toShort)
        val wav = AudioCodec.encodeWav(samples, Mm4Rate)
        val (_, _, pcm) = AudioCodec.decode(wav).getOrElse(
          sys.error(s"mm4: WAV round-trip failed for doc $docId"))
        var zcr = 0L
        var energy = 0L
        var s1 = 0L
        var s2 = 0L
        var prevNeg = false
        var i = 0
        while (i < pcm.length) {
          val x = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort.toLong
          val neg = x < 0
          if (i > 0 && neg != prevNeg) zcr += 1
          prevNeg = neg
          energy += x * x
          val s0 = x + s1 - s2
          s2 = s1
          s1 = s0
          i += 2
        }
        (docId, zcr, energy, s1 * s1 + s2 * s2 - s1 * s2)
      }
    }.toDF("doc_id", "zero_crossings", "energy", "g_power")
      .orderBy("doc_id")
  }

  private val mm4Sql: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |sm AS (SELECT CAST(i AS BIGINT) AS i FROM range($Mm4Samples) t(i)),
       |x AS (
       |  SELECT doc_id, i,
       |    CAST((ord(substr(text, CAST(i % len AS INTEGER) + 1, 1)) - 64) * 256
       |      AS BIGINT) AS v
       |  FROM d CROSS JOIN sm),
       |g(doc_id, i, s1, s2) AS (
       |  SELECT doc_id, CAST(0 AS BIGINT), v, CAST(0 AS BIGINT)
       |  FROM x WHERE i = 0
       |  UNION ALL
       |  SELECT g.doc_id, g.i + 1, x.v + g.s1 - g.s2, g.s1
       |  FROM g JOIN x ON x.doc_id = g.doc_id AND x.i = g.i + 1),
       |feats AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN i > 0 AND ((v < 0) <> (pv < 0))
       |      THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       |    CAST(SUM(v * v) AS BIGINT) AS energy
       |  FROM (SELECT doc_id, i, v,
       |          lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv FROM x)
       |  GROUP BY doc_id)
       |SELECT f.doc_id, f.zero_crossings, f.energy,
       |  CAST(g.s1 * g.s1 + g.s2 * g.s2 - g.s1 * g.s2 AS BIGINT) AS g_power
       |FROM feats f JOIN g ON g.doc_id = f.doc_id AND g.i = ${Mm4Samples - 1}
       |ORDER BY f.doc_id""".stripMargin

  // mm5 resize geometry: mm2's 24×16 image box-downsampled by 4 → 6×4
  private val Mm5W = 24
  private val Mm5H = 16
  private val Mm5F = 4

  /** mm5: the RESIZE tier's oracle row — mm2 checks decode; this checks
    * the downscale arithmetic and the re-encode of its output. Each
    * small document's ASCII bytes tile a ${Mm5W}×${Mm5H} gray image,
    * which round-trips through a REAL PNG encode/decode, is resized by
    * the integer box filter ([[ImageCodec.boxDownsample]], out pixel =
    * ⌊Σ 4×4 block / 16⌋ — exact arithmetic, unlike the Graphics2D
    * bilinear path whose taps vary by JVM), and the RESIZED image
    * round-trips through a SECOND PNG encode/decode before features are
    * read — so the resize output itself is container-checked, not just
    * computed. Features: the downsampled pixel sum and a
    * position-weighted sum Σ out·(idx+1) that goes red if the resize
    * transposes, flips, or mis-strides even though the plain sum would
    * still match. The oracle replays both from text bytes with integer
    * division. */
  def mm5ImageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val img = new java.awt.image.BufferedImage(Mm5W, Mm5H,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < Mm5W * Mm5H) {
          val v = bytes(i % bytes.length) & 0xff
          img.setRGB(i % Mm5W, i / Mm5W, (v << 16) | (v << 8) | v)
          i += 1
        }
        val full = ImageCodec.decode(ImageCodec.encodePng(img)).getOrElse(
          sys.error(s"mm5: PNG round-trip failed for doc $docId"))
        val small = ImageCodec.boxDownsample(full, Mm5F)
        val back = ImageCodec.decode(ImageCodec.encodePng(small)).getOrElse(
          sys.error(s"mm5: resized PNG round-trip failed for doc $docId"))
        var sum = 0L
        var wsum = 0L
        var y = 0
        while (y < back.getHeight) {
          var x = 0
          while (x < back.getWidth) {
            val v = (back.getRGB(x, y) & 0xff).toLong
            sum += v
            wsum += v * (y * back.getWidth + x + 1)
            x += 1
          }
          y += 1
        }
        (docId, back.getWidth, back.getHeight, sum, wsum)
      }
    }.toDF("doc_id", "w2", "h2", "ds_sum", "ds_wsum")
      .orderBy("doc_id")
  }

  private val mm5Sql: String = {
    val outW = Mm5W / Mm5F
    val outH = Mm5H / Mm5F
    val outPx = outW * outH
    val blk = Mm5F * Mm5F
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |o AS (SELECT CAST(i AS BIGINT) AS o FROM range($outPx) t(i)),
       |b AS (SELECT CAST(i AS BIGINT) AS b FROM range($blk) t(i)),
       |px AS (
       |  SELECT d.doc_id, o.o,
       |    ((o.o // $outW) * $Mm5F + b.b // $Mm5F) * $Mm5W
       |      + (o.o % $outW) * $Mm5F + b.b % $Mm5F AS i,
       |    d.text, d.len
       |  FROM d CROSS JOIN o CROSS JOIN b),
       |ds AS (
       |  SELECT doc_id, o,
       |    SUM(ord(substr(text, CAST(i % len AS INTEGER) + 1, 1))) // $blk AS v
       |  FROM px GROUP BY doc_id, o)
       |SELECT doc_id, CAST($outW AS INTEGER) AS w2, CAST($outH AS INTEGER) AS h2,
       |  CAST(SUM(v) AS BIGINT) AS ds_sum,
       |  CAST(SUM(v * (o + 1)) AS BIGINT) AS ds_wsum
       |FROM ds GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Luma difference below which a pixel counts as unchanged — the
    * classic scene-cut detector's per-pixel gate. */
  private val Mm6ChangeThr = 16

  /** mm6: TEMPORAL video analysis — mm1 reads each frame in isolation;
    * this reads adjacent-frame PAIRS from the same real Y4M container
    * (identical synthesis, so the decode path is shared): per pair, the
    * sum of absolute luma differences (SAD — the standard scene-change
    * signal) and the count of pixels whose change exceeds
    * [[Mm6ChangeThr]] (the cut detector's vote). Any drift in frame
    * ORDER or frame offsets — which mm1's per-frame sums cannot see if
    * two frames swap — flips the pairwise diffs and goes red. The
    * oracle replays both from text bytes: pixel (f, i) is
    * `ord(text[(f·px + i) mod len])`. */
  def mm6SceneChange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.flatMap { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val frames = (0 until MmF).map { f =>
          val img = new java.awt.image.BufferedImage(MmW, MmH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < MmW * MmH) {
            val v = bytes((f * MmW * MmH + i) % bytes.length) & 0xff
            img.setRGB(i % MmW, i / MmW, (v << 16) | (v << 8) | v)
            i += 1
          }
          img
        }
        val container = Y4mCodec.encodeY4m(frames, "mono") // REAL bytes
        val v = Y4mCodec.decode(container).getOrElse(
          sys.error(s"mm6: container round-trip failed for doc $docId"))
        (0 until v.frames.length - 1).map { f =>
          val a = v.frames(f)
          val b = v.frames(f + 1)
          var sad = 0L
          var nch = 0L
          var y = 0
          while (y < v.height) {
            var x = 0
            while (x < v.width) {
              val d = math.abs((b.getRGB(x, y) & 0xff) - (a.getRGB(x, y) & 0xff))
              sad += d
              if (d > Mm6ChangeThr) nch += 1
              x += 1
            }
            y += 1
          }
          (docId, f, sad, nch)
        }
      }
    }.toDF("doc_id", "pair_no", "sad", "n_changed")
      .orderBy("doc_id", "pair_no")
  }

  private val mm6Sql: String = {
    val px = MmW * MmH
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |fr AS (SELECT CAST(f AS INTEGER) AS pair_no FROM range(${MmF - 1}) t(f)),
       |px AS (SELECT CAST(i AS BIGINT) AS i FROM range($px) t(i)),
       |dv AS (
       |  SELECT d.doc_id, fr.pair_no,
       |    ABS(ord(substr(d.text,
       |        CAST(((fr.pair_no + 1) * $px + px.i) % d.len AS INTEGER) + 1, 1))
       |      - ord(substr(d.text,
       |        CAST((fr.pair_no * $px + px.i) % d.len AS INTEGER) + 1, 1))) AS ad
       |  FROM d CROSS JOIN fr CROSS JOIN px)
       |SELECT doc_id, pair_no, CAST(SUM(ad) AS BIGINT) AS sad,
       |  CAST(SUM(CASE WHEN ad > $Mm6ChangeThr THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
       |FROM dv GROUP BY doc_id, pair_no
       |ORDER BY doc_id, pair_no""".stripMargin
  }

  /** Walsh–Hadamard transform length (power of two). */
  private val Mm7N = 16

  /** mm7: the SPECTRAL audio tier — mm4's Goertzel reads one frequency
    * bin; this computes a full orthogonal transform. The FFT's float
    * butterflies can't cross engines bit-exactly, so the spectrum here
    * is the Walsh–Hadamard transform (the sequency-domain analogue used
    * for exactly this reason in integer DSP): coefficient
    * c_k = Σ_n s_n · (−1)^popcount(n AND k) over the clip's first
    * [[Mm7N]] samples — pure ±1 integer arithmetic, so Spark (from REAL
    * RIFF-WAVE bytes through the full parser, mm3's synthesis) and
    * DuckDB (`bit_count(i & k)` parity over `ord`-derived PCM16) agree
    * to the bit. c_0 is the DC sum; higher k = higher sequency. */
  def mm7AudioWht(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.flatMap { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val samples = Array.tabulate(Mm3Samples)(i =>
          (((bytes(i % bytes.length) & 0xff) - 128) * 256).toShort)
        val wav = AudioCodec.encodeWav(samples, Mm3Rate) // REAL bytes
        val (_, _, pcm) = AudioCodec.decode(wav).getOrElse(
          sys.error(s"mm7: WAV round-trip failed for doc $docId"))
        val s16 = Array.tabulate(Mm7N)(i =>
          ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toLong)
        (0 until Mm7N).map { k =>
          var c = 0L
          var n = 0
          while (n < Mm7N) {
            val sign = 1L - 2L * (java.lang.Long.bitCount(n.toLong & k.toLong) % 2)
            c += s16(n) * sign
            n += 1
          }
          (docId, k.toLong, c)
        }
      }
    }.toDF("doc_id", "k", "coef")
      .orderBy("doc_id", "k")
  }

  private val mm7Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |sm AS (SELECT CAST(i AS BIGINT) AS i FROM range($Mm7N) t(i)),
       |ks AS (SELECT CAST(j AS BIGINT) AS k FROM range($Mm7N) t(j)),
       |s AS (
       |  SELECT d.doc_id, sm.i,
       |    CAST((ord(substr(d.text, CAST(sm.i % d.len AS INTEGER) + 1, 1))
       |      - 128) * 256 AS BIGINT) AS v
       |  FROM d CROSS JOIN sm)
       |SELECT doc_id, k,
       |  CAST(SUM(v * (1 - 2 * (bit_count(i & k) % 2))) AS BIGINT) AS coef
       |FROM s CROSS JOIN ks GROUP BY doc_id, k
       |ORDER BY doc_id, k""".stripMargin

  /** mm8 block-motion geometry: [[Mm8B]]×[[Mm8B]] blocks over the
    * mm1 clip ([[MmW]]×[[MmH]] divides evenly into 4×3 blocks), each
    * searched over displacements in [−[[Mm8Search]], [[Mm8Search]]]². */
  private val Mm8B = 4
  private val Mm8Search = 2

  /** mm8: BLOCK MOTION ESTIMATION — the video-codec primitive one step
    * past mm6's cut detector: for every [[Mm8B]]² block of each LATER
    * frame, the integer-SAD argmin displacement into the EARLIER frame
    * over a (2·[[Mm8Search]]+1)² search window (candidates clamped to
    * the frame; ties break to the smallest (sad, dy, dx) — the
    * deterministic raster convention both engines share). Frames come
    * from the REAL Y4M container (mm1's synthesis, full decode path);
    * the oracle replays every candidate SAD from text bytes with mm5's
    * index arithmetic and picks the same argmin by window rank — a
    * one-pixel drift in frame offsets, block addressing, or the clamp
    * moves some block's best vector and goes red. Scale shape: decode
    * per-partition, then row-local integer loops; one bounded row per
    * (doc, pair, block). */
  /** The block scan mm8 and mm9 share: decode the doc's REAL Y4M clip
    * and for every (pair, block) return the SAD-argmin displacement,
    * its SAD, and the ZERO-motion SAD (the dx=dy=0 candidate — always
    * in frame, so it is defined for every block). One row per
    * (doc, pair, block): (docId, pair, blkX, blkY, dx, dy, bestSad,
    * zeroSad). */
  private def blockMotionScan(docId: Long, text: String)
      : Seq[(Long, Int, Int, Int, Int, Int, Long, Long)] = {
    val bytes = asciiBytes(docId, text)
    val frames = (0 until MmF).map { f =>
      val img = new java.awt.image.BufferedImage(MmW, MmH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < MmW * MmH) {
        val v = bytes((f * MmW * MmH + i) % bytes.length) & 0xff
        img.setRGB(i % MmW, i / MmW, (v << 16) | (v << 8) | v)
        i += 1
      }
      img
    }
    val container = Y4mCodec.encodeY4m(frames, "mono") // REAL bytes
    val v = Y4mCodec.decode(container).getOrElse(
      sys.error(s"mm8: container round-trip failed for doc $docId"))
    def px(img: java.awt.image.BufferedImage, x: Int, y: Int): Int =
      img.getRGB(x, y) & 0xff
    (0 until v.frames.length - 1).flatMap { f =>
      val a = v.frames(f)
      val b = v.frames(f + 1)
      for {
        blkY <- 0 until MmH / Mm8B
        blkX <- 0 until MmW / Mm8B
      } yield {
        var bestSad = Long.MaxValue
        var bestDx = 0
        var bestDy = 0
        var zeroSad = 0L
        var dy = -Mm8Search
        while (dy <= Mm8Search) {
          var dx = -Mm8Search
          while (dx <= Mm8Search) {
            val x0 = blkX * Mm8B + dx
            val y0 = blkY * Mm8B + dy
            if (x0 >= 0 && y0 >= 0 &&
                x0 + Mm8B <= v.width && y0 + Mm8B <= v.height) {
              var sad = 0L
              var u = 0
              while (u < Mm8B) {
                var w = 0
                while (w < Mm8B) {
                  sad += math.abs(
                    px(b, blkX * Mm8B + w, blkY * Mm8B + u) -
                      px(a, x0 + w, y0 + u))
                  w += 1
                }
                u += 1
              }
              if (dx == 0 && dy == 0) zeroSad = sad
              // strict < keeps the FIRST (dy, dx) among ties — the
              // ascending scan order the oracle's rank replays
              if (sad < bestSad) { bestSad = sad; bestDx = dx; bestDy = dy }
            }
            dx += 1
          }
          dy += 1
        }
        (docId, f, blkX, blkY, bestDx, bestDy, bestSad, zeroSad)
      }
    }
  }

  def mm8BlockMotion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.flatMap { case (docId, text) =>
        blockMotionScan(docId, text).map { case (d, f, bx, by, dx, dy, sad, _) =>
          (d, f, bx, by, dx, dy, sad)
        }
      }
    }.toDF("doc_id", "pair_no", "blk_x", "blk_y", "dx", "dy", "sad")
      .orderBy("doc_id", "pair_no", "blk_y", "blk_x")
  }

  /** mm9: MOTION-COMPENSATED RESIDUAL GAIN — the codec primitive one
    * step past mm8's vector search: per block, the SAD residual AFTER
    * compensation (mm8's argmin SAD) against the ZERO-motion residual
    * (the dx=dy=0 candidate — what a codec pays if it skips motion
    * search), and their difference `gain` — the bits-saved signal every
    * encoder's rate control weighs against the vector's own cost.
    * `gain >= 0` by construction (the zero candidate is always in the
    * search window, so the argmin can never lose to it) — an engine
    * whose clamp or tie-break drifts breaks that invariant before it
    * even reaches the oracle. Same real Y4M decode path as mm8; the
    * oracle reuses mm8's candidate-SAD CTEs and joins the rank-1 row
    * with the zero-displacement row per block. */
  def mm9MotionGain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") < MmDocs)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    docs.mapPartitions { it =>
      it.flatMap { case (docId, text) =>
        blockMotionScan(docId, text).map {
          case (d, f, bx, by, _, _, best, zero) =>
            (d, f, bx, by, zero, best, zero - best)
        }
      }
    }.toDF("doc_id", "pair_no", "blk_x", "blk_y",
        "sad_zero", "sad_best", "gain")
      .orderBy("doc_id", "pair_no", "blk_y", "blk_x")
  }

  /** The candidate-SAD CTE chain mm8 and mm9 share: every in-frame
    * (doc, pair, block, displacement) SAD from text bytes via mm5's
    * index arithmetic, ranked per block by (sad, dy, dx). Ends in
    * `best` (rk = 1 is the argmin) with `sadt` still addressable for
    * the zero-displacement row. */
  private lazy val mm8Ctes: String = {
    val px = MmW * MmH
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id < $MmDocs),
       |fr AS (SELECT CAST(f AS INTEGER) AS pair_no FROM range(${MmF - 1}) t(f)),
       |bl AS (SELECT CAST(x AS INTEGER) AS blk_x, CAST(y AS INTEGER) AS blk_y
       |       FROM range(${MmW / Mm8B}) t(x) CROSS JOIN range(${MmH / Mm8B}) t2(y)),
       |dp AS (SELECT CAST(x AS INTEGER) AS dx, CAST(y AS INTEGER) AS dy
       |       FROM range(-$Mm8Search, ${Mm8Search + 1}) t(x)
       |       CROSS JOIN range(-$Mm8Search, ${Mm8Search + 1}) t2(y)),
       |off AS (SELECT CAST(u AS INTEGER) AS u, CAST(v AS INTEGER) AS v
       |        FROM range($Mm8B) t(u) CROSS JOIN range($Mm8B) t2(v)),
       |cand AS (
       |  SELECT d.doc_id, d.text, d.len, fr.pair_no, bl.blk_x, bl.blk_y,
       |    dp.dx, dp.dy
       |  FROM d CROSS JOIN fr CROSS JOIN bl CROSS JOIN dp
       |  WHERE bl.blk_x * $Mm8B + dp.dx >= 0
       |    AND bl.blk_x * $Mm8B + dp.dx + $Mm8B <= $MmW
       |    AND bl.blk_y * $Mm8B + dp.dy >= 0
       |    AND bl.blk_y * $Mm8B + dp.dy + $Mm8B <= $MmH),
       |sadt AS (
       |  SELECT doc_id, pair_no, blk_x, blk_y, dx, dy,
       |    SUM(ABS(
       |      ord(substr(text, CAST(((pair_no + 1) * $px
       |        + (blk_y * $Mm8B + v) * $MmW + blk_x * $Mm8B + u)
       |        % len AS INTEGER) + 1, 1))
       |      - ord(substr(text, CAST((pair_no * $px
       |        + (blk_y * $Mm8B + v + dy) * $MmW + blk_x * $Mm8B + u + dx)
       |        % len AS INTEGER) + 1, 1)))) AS sad
       |  FROM cand CROSS JOIN off
       |  GROUP BY doc_id, pair_no, blk_x, blk_y, dx, dy),
       |best AS (
       |  SELECT doc_id, pair_no, blk_x, blk_y, dx, dy, sad,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id, pair_no, blk_x, blk_y
       |      ORDER BY sad, dy, dx) AS rk
       |  FROM sadt)""".stripMargin
  }

  private lazy val mm8Sql: String =
    s"""$mm8Ctes
       |SELECT doc_id, pair_no, blk_x, blk_y, dx, dy, CAST(sad AS BIGINT) AS sad
       |FROM best WHERE rk = 1
       |ORDER BY doc_id, pair_no, blk_y, blk_x""".stripMargin

  /** DuckDB replay of [[mm9MotionGain]]: mm8's candidate chain, the
    * rank-1 argmin joined with the zero-displacement candidate per
    * block, gain as their difference. */
  private lazy val mm9Sql: String =
    s"""$mm8Ctes,
       |zero AS (
       |  SELECT doc_id, pair_no, blk_x, blk_y, sad FROM sadt
       |  WHERE dx = 0 AND dy = 0)
       |SELECT b.doc_id, b.pair_no, b.blk_x, b.blk_y,
       |  CAST(z.sad AS BIGINT) AS sad_zero,
       |  CAST(b.sad AS BIGINT) AS sad_best,
       |  CAST(z.sad - b.sad AS BIGINT) AS gain
       |FROM best b JOIN zero z
       |  ON z.doc_id = b.doc_id AND z.pair_no = b.pair_no
       |  AND z.blk_x = b.blk_x AND z.blk_y = b.blk_y
       |WHERE b.rk = 1
       |ORDER BY b.doc_id, b.pair_no, b.blk_y, b.blk_x""".stripMargin

  // ---------------------------------------------------------------------
  // mm10/mm11: perceptual near-duplicate detection over the MEDIA columns —
  // the dedup tier (MinHash/SimHash/semantic) crossing into image and audio.
  // Both rows share one discipline: a 64-bit perceptual fingerprint computed
  // from REAL decoded container bytes, exact all-pairs-at-Hamming≤4 via the
  // SimHash pigeonhole banding (never all-pairs), and a DuckDB oracle that
  // replays the fingerprint from text bytes with integer arithmetic.

  /** Bands per fingerprint; Hamming ≤ NumBands−1 keeps exact recall. */
  private[graft] val MmNdBands = 5
  private val MmNdMaxHamming = MmNdBands - 1

  /** The banded Hamming distance between the `a`- and `b`-aliased sides
    * of a band join — THE one copy of the scoring arithmetic, consumed
    * by [[ndPairs]], [[ndSweepBatch]], and the at-rest gate. */
  private def ndHamming: Column =
    (0 until MmNdBands).map(t =>
      bit_count(col(s"a.b$t").bitwiseXOR(col(s"b.b$t")))).reduce(_ + _)

  /** 64 fingerprint bits → [[MmNdBands]] disjoint band values, INTERLEAVED
    * (band t = bits with j % 5 == t, LSB = smallest j). Interleaving, not
    * contiguous 13-bit slices, because the fingerprint's tail bits cover
    * the synthesis' padded region: short docs pin those bits to 0, and a
    * contiguous last band then degenerates into one giant join bucket
    * (measured: a 1382-doc bucket → ~950k candidate pairs at sf0.1, vs a
    * 15-doc max bucket interleaved). Pigeonhole recall is unaffected — any
    * 5 DISJOINT bit classes guarantee a clean band at Hamming ≤ 4. */
  private[graft] def ndBands(bits: Array[Int]): Array[Long] = {
    val out = new Array[Long](MmNdBands)
    var j = 0
    while (j < 64) {
      out(j % MmNdBands) |= bits(j).toLong << (j / MmNdBands)
      j += 1
    }
    out
  }

  /** The banded pair join mm10 and mm11 share: input is one row per doc
    * with the five band values (b0..b4); output is every pair (doc_a <
    * doc_b) within Hamming ≤ [[MmNdMaxHamming]], found by equi-joining on
    * (band index, band value) — a pair within that radius differs in fewer
    * bits than there are bands, so at least one band matches exactly
    * (recall 1.0, [[graft.operators.SimHash]]'s argument). Scale shape:
    * the banded table is 5× the (tiny) fingerprint table, the join
    * shuffles on (t, bv) band buckets, and the Hamming filter runs only
    * inside buckets — the corpus is never self-joined. */
  private def ndPairs(hashes: DataFrame): DataFrame = {
    // persist + EAGER count before self-joining: both join sides would
    // otherwise recompute the full decode+fingerprint chain — and a
    // lazy persist alone does not prevent it, because the self-join's
    // two shuffle-map stages are scheduled concurrently and can both
    // compute the same uncached partition on first touch (the profiled
    // ConnectedComponents trap; its fix — materialize first — applies).
    // Cache lifecycle: read lazily by the returned plan; loop callers
    // clearCache between runs (Bench/Verify do).
    val banded = ndBanded(hashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    banded.count() // materialize ONCE before the two map stages race
    val hamming = ndHamming
    // a pair can agree on several bands → distinct AFTER scoring (hamming
    // is a pure function of the pair, so dedup order is immaterial)
    banded.as("a").join(banded.as("b"),
        col("a.t") === col("b.t") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .filter(col("hamming") <= MmNdMaxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  // mm10 geometry: 8 rows × 9 columns of B-pixel cells, B = ceil(len/72) —
  // the image WIDTH scales with the text so content always fills the frame
  // (a fixed canvas leaves short docs mostly padding, which collapses
  // unrelated fingerprints together). Pixels PAST the text pad with 32
  // (space) instead of wrapping (mm2's `i % len`): wrapping re-phases every
  // byte after the first wrap when two near-identical docs differ in
  // length, destroying exactly the pairs a perceptual hash exists to find —
  // padding keeps edits LOCAL in the bit pattern.
  private val Mm10Rows = 8
  private val Mm10Cols = 9
  private val Mm10Cells = Mm10Rows * Mm10Cols
  private val Mm10Pad = 32

  /** mm10: PERCEPTUAL-HASH IMAGE NEAR-DUP — dedup crossing into the image
    * column. Each document renders as a real 9B×8 gray raster (B =
    * ⌈len/72⌉), round-trips through the REAL PNG codec
    * ([[ImageCodec.encodePng]]/[[ImageCodec.decode]] — lossless, so the
    * decoded pixels are bit-exact), is box-reduced to a 9×8 luma grid
    * (cell = ⌊Σ B horizontal px / B⌋ — the classic dHash downsample in
    * exact integer form), and fingerprinted with 64 dHash bits (bit = 1
    * iff the right cell outshines the left, 8 comparisons × 8 rows). Near
    * duplicates are all pairs within Hamming ≤ 4, found EXACTLY by the
    * banded join ([[ndPairs]]) — never an all-pairs scan. The oracle
    * replays pixels, cells, bits, bands, and the band join from text bytes
    * with integer arithmetic; one bit of drift in the PNG writer, the IDAT
    * inflate, `getRGB`, or the cell floor moves a band value and goes red. */
  /** The per-doc dHash band computation mm10 and mm14 share: render,
    * REAL PNG round-trip, 9×8 floor-mean grid, 64 comparison bits,
    * [[ndBands]]. One row per doc: (doc_id, b0..b4). */
  private def mm10Fingerprints(docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val b = (bytes.length + Mm10Cells - 1) / Mm10Cells
        val w = Mm10Cols * b
        val img = new java.awt.image.BufferedImage(w, Mm10Rows,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < w * Mm10Rows) {
          val v = if (i < bytes.length) bytes(i) & 0xff else Mm10Pad
          img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
          i += 1
        }
        val back = ImageCodec.decode(ImageCodec.encodePng(img)).getOrElse(
          sys.error(s"mm10: PNG round-trip failed for doc $docId"))
        // 9×8 luma grid from the DECODED pixels: floor-mean of B-px runs
        val cells = Array.ofDim[Long](Mm10Rows, Mm10Cols)
        var y = 0
        while (y < Mm10Rows) {
          var c = 0
          while (c < Mm10Cols) {
            var sum = 0L
            var dx = 0
            while (dx < b) {
              sum += back.getRGB(c * b + dx, y) & 0xff
              dx += 1
            }
            cells(y)(c) = sum / b
            c += 1
          }
          y += 1
        }
        val bits = new Array[Int](64)
        y = 0
        while (y < Mm10Rows) {
          var c = 0
          while (c < Mm10Cols - 1) {
            bits(y * (Mm10Cols - 1) + c) =
              if (cells(y)(c + 1) > cells(y)(c)) 1 else 0
            c += 1
          }
          y += 1
        }
        val bd = ndBands(bits)
        (docId, bd(0), bd(1), bd(2), bd(3), bd(4))
      }
    }.toDF("doc_id", "b0", "b1", "b2", "b3", "b4")
  }

  /** The banded explosion ndPairs and the mm14 index share: one row per
    * (doc, band) carrying the full band vector for the Hamming check. */
  private def ndBanded(hashes: DataFrame): DataFrame =
    hashes.select(
        (col("doc_id") +: (0 until MmNdBands).map(t => col(s"b$t"))) :+
          explode(array((0 until MmNdBands).map(t =>
            struct(lit(t).as("t"), col(s"b$t").as("bv"))): _*)).as("band"): _*)
      .select((col("doc_id") +: (0 until MmNdBands).map(t => col(s"b$t"))) :+
          col("band.t").as("t") :+ col("band.bv").as("bv"): _*)

  def mm10ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    ndPairs(mm10Fingerprints(docs))
  }

  /** One (doc, band) row per dHash fingerprint band — [[ndBanded]] over
    * the shared mm10 fingerprints, exposed for the streaming tier's
    * rolling image family ([[graft.streaming.StreamOps.imageNdBatch]]). */
  private[graft] def imageBandRows(
      docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame =
    ndBanded(mm10Fingerprints(docs))

  /** [[imageBandRows]] for the audio modality — [[ndBanded]] over mm11's
    * energy-contour fingerprints ([[graft.streaming.StreamOps
    * .audioNdBatch]]). */
  private[graft] def audioBandRows(
      docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame =
    ndBanded(mm11Fingerprints(docs))

  /** [[imageBandRows]] for the video modality — [[ndBanded]] over mm18's
    * frame-luma-contour fingerprints ([[graft.streaming.StreamOps
    * .videoNdBatch]]). */
  private[graft] def videoBandRows(
      docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame =
    ndBanded(mm18Fingerprints(docs))

  /** Band-row count above which [[ndSweepBatch]] stops broadcasting the
    * arriving batch: each band row is [[MmNdBands]]+3 longs (~100 B
    * serialized), so 1M rows ≈ 100 MB — past that an explicit broadcast
    * hint (which bypasses autoBroadcastJoinThreshold) risks the driver,
    * and a shuffled (t, bv) equi-join is the correct plan anyway. */
  private[graft] val NdSweepBroadcastMaxRows = 1L << 20

  /** The ROLLING sweep join of the image family: every Hamming ≤
    * [[MmNdMaxHamming]] pair between the accumulated `landed` band rows
    * and the arriving `batch` band rows, plus within the batch itself —
    * so each pair is found exactly ONCE, at its later endpoint's wave
    * (the c7 sweep identity: per-wave pair sets sum to mm10's one-shot
    * answer). A micro-batch-sized arrival (`batchRows` ≤
    * [[NdSweepBroadcastMaxRows]]) broadcasts into the landed side; a
    * larger arrival — a backfill wave replaying a corpus slice — falls
    * back to the shuffled band equi-join instead of forcing an
    * unbounded broadcast past the autoBroadcastJoinThreshold guard.
    * Output normalized to (doc_a < doc_b, hamming). One copy of the
    * banding/Hamming arithmetic shared with [[ndPairs]] and the at-rest
    * gate. */
  private[graft] def ndSweepBatch(landed: DataFrame, batch: DataFrame,
      batchRows: Long): DataFrame = {
    val hamming = ndHamming
    val arriving =
      if (batchRows <= NdSweepBroadcastMaxRows) broadcast(batch.as("b"))
      else batch.as("b")
    val cross = landed.as("a").join(arriving,
        col("a.t") === col("b.t") && col("a.bv") === col("b.bv"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        hamming.as("hamming"))
    val within = batch.as("a").join(batch.as("b"),
        col("a.t") === col("b.t") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
    cross.unionByName(within)
      .filter(col("hamming") <= MmNdMaxHamming)
      .distinct()
  }

  /** The band-assembly + banded-join CTE block mm10, mm11, and the mm13
    * composition share: takes a `${p}bits` CTE of (doc_id, j ∈ [0,64),
    * bit ∈ {0,1}) and ends in `${p}nd(doc_a, doc_b, hamming)` — the
    * pairs within Hamming ≤ [[MmNdMaxHamming]]. Bit → band arithmetic
    * mirrors [[ndBands]] (t = j % 5, position = j / 5); hamming is
    * summed per-band popcounts (never materializing the full 64-bit
    * value, whose sign bit would overflow a BIGINT power-of-two sum).
    * `p` namespaces the CTEs so the image and audio chains can coexist
    * in one WITH (mm13); "" keeps the solo oracles' zero-prefix text. */
  private def ndSqlPairsCtes(p: String): String =
    s"""${p}bands AS (
       |  SELECT doc_id, CAST(j % $MmNdBands AS INTEGER) AS t,
       |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(j // $MmNdBands AS INTEGER)))
       |      AS BIGINT) AS bv
       |  FROM ${p}bits GROUP BY doc_id, t),
       |${p}hv AS (
       |  SELECT doc_id,
       |    MAX(CASE WHEN t=0 THEN bv END) AS b0,
       |    MAX(CASE WHEN t=1 THEN bv END) AS b1,
       |    MAX(CASE WHEN t=2 THEN bv END) AS b2,
       |    MAX(CASE WHEN t=3 THEN bv END) AS b3,
       |    MAX(CASE WHEN t=4 THEN bv END) AS b4
       |  FROM ${p}bands GROUP BY doc_id),
       |${p}cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ${p}bands a JOIN ${p}bands b
       |    ON a.t = b.t AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |${p}nd AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
       |       + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
       |       + bit_count(xor(x.b4, y.b4)) AS INTEGER) AS hamming
       |  FROM ${p}cand c JOIN ${p}hv x ON x.doc_id = c.doc_a
       |    JOIN ${p}hv y ON y.doc_id = c.doc_b
       |  WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
       |      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
       |      + bit_count(xor(x.b4, y.b4)) <= $MmNdMaxHamming)""".stripMargin

  /** mm10's fingerprint-bit CTE chain (`${p}bits`), prefixable for the
    * mm13 composition. */
  private def mm10BitsCtes(p: String): String =
    s"""${p}d AS (
       |  SELECT doc_id, text, length(text) AS len,
       |    (length(text) + ${Mm10Cells - 1}) // $Mm10Cells AS bb
       |  FROM documents),
       |${p}px AS (
       |  SELECT doc_id, len, bb, text,
       |    unnest(generate_series(0, $Mm10Cells * bb - 1)) AS i
       |  FROM ${p}d),
       |${p}cell AS (
       |  SELECT doc_id, bb,
       |    (i // ($Mm10Cols * bb)) * $Mm10Cols + (i % ($Mm10Cols * bb)) // bb AS k,
       |    SUM(CASE WHEN i < len
       |        THEN ord(substr(text, CAST(i AS INTEGER) + 1, 1))
       |        ELSE $Mm10Pad END) AS s
       |  FROM ${p}px GROUP BY doc_id, bb, k),
       |${p}cv AS (SELECT doc_id, k, s // bb AS v FROM ${p}cell),
       |${p}bits AS (
       |  SELECT c1.doc_id,
       |    CAST((c1.k // $Mm10Cols) * ${Mm10Cols - 1} + (c1.k % $Mm10Cols)
       |      AS INTEGER) AS j,
       |    CASE WHEN c2.v > c1.v THEN 1 ELSE 0 END AS bit
       |  FROM ${p}cv c1 JOIN ${p}cv c2
       |    ON c2.doc_id = c1.doc_id AND c2.k = c1.k + 1
       |  WHERE c1.k % $Mm10Cols < ${Mm10Cols - 1})""".stripMargin

  private lazy val mm10Sql: String =
    s"""WITH ${mm10BitsCtes("")},
       |${ndSqlPairsCtes("")}
       |SELECT doc_a, doc_b, hamming FROM nd ORDER BY doc_a, doc_b""".stripMargin

  // mm11 geometry: 65 frames of B = ceil(len/65) samples (64 adjacent-
  // frame comparisons); samples past the text pad with SILENCE (0) —
  // same pad-not-wrap rationale as mm10.
  private val Mm11Frames = 65

  /** mm11: AUDIO-FINGERPRINT NEAR-DUP — dedup crossing into the audio
    * column. Each document renders as 65·B PCM16 samples (mm4's mapping,
    * `(byte − 64) · 256`, silence-padded), round-trips through the REAL
    * RIFF/WAVE codec ([[AudioCodec.encodeWav]]/[[AudioCodec.decode]] —
    * PCM16→PCM16 is bit-exact), and fingerprints as 64 adjacent-frame
    * energy comparisons (frame energy = Σ x² over its B decoded samples —
    * the coarse loudness-contour fingerprint, integer-exact unlike a
    * float FFT). Near duplicates are all pairs within Hamming ≤ 4 via the
    * same exact banded join as mm10; the oracle replays energies, bits,
    * and bands from text bytes in BIGINT. */
  def mm11AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    ndPairs(mm11Fingerprints(docs))
  }

  /** The per-doc audio fingerprint mm11 and mm15 share: render to PCM16,
    * REAL RIFF/WAVE round-trip, 65 frame energies, 64 adjacent-frame
    * comparison bits, [[ndBands]]. One row per doc: (doc_id, b0..b4). */
  private def mm11Fingerprints(docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val b = (bytes.length + Mm11Frames - 1) / Mm11Frames
        val samples = Array.tabulate(Mm11Frames * b)(i =>
          if (i < bytes.length) (((bytes(i) & 0xff) - 64) * 256).toShort
          else 0.toShort)
        val wav = AudioCodec.encodeWav(samples, Mm3Rate) // REAL bytes
        val (_, _, pcm) = AudioCodec.decode(wav).getOrElse(
          sys.error(s"mm11: WAV round-trip failed for doc $docId"))
        val energies = new Array[Long](Mm11Frames)
        var f = 0
        while (f < Mm11Frames) {
          var e = 0L
          var j = 0
          while (j < b) {
            val idx = (f * b + j) * 2
            val x = ((pcm(idx) & 0xff) | (pcm(idx + 1) << 8)).toShort.toLong
            e += x * x
            j += 1
          }
          energies(f) = e
          f += 1
        }
        val bits = new Array[Int](64)
        f = 0
        while (f < Mm11Frames - 1) {
          bits(f) = if (energies(f + 1) > energies(f)) 1 else 0
          f += 1
        }
        val bd = ndBands(bits)
        (docId, bd(0), bd(1), bd(2), bd(3), bd(4))
      }
    }.toDF("doc_id", "b0", "b1", "b2", "b3", "b4")
  }

  /** mm11's fingerprint-bit CTE chain (`${p}bits`), prefixable for the
    * mm13 composition. */
  private def mm11BitsCtes(p: String): String =
    s"""${p}d AS (
       |  SELECT doc_id, text, length(text) AS len,
       |    (length(text) + ${Mm11Frames - 1}) // $Mm11Frames AS bb
       |  FROM documents),
       |${p}sm AS (
       |  SELECT doc_id, len, bb, text,
       |    unnest(generate_series(0, $Mm11Frames * bb - 1)) AS i
       |  FROM ${p}d),
       |${p}fe AS (
       |  SELECT doc_id, i // bb AS f,
       |    SUM(CASE WHEN i < len THEN
       |        CAST((ord(substr(text, CAST(i AS INTEGER) + 1, 1)) - 64) * 256
       |          AS BIGINT)
       |        * ((ord(substr(text, CAST(i AS INTEGER) + 1, 1)) - 64) * 256)
       |        ELSE 0 END) AS e
       |  FROM ${p}sm GROUP BY doc_id, f),
       |${p}bits AS (
       |  SELECT a.doc_id, CAST(a.f AS INTEGER) AS j,
       |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
       |  FROM ${p}fe a JOIN ${p}fe b
       |    ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  WHERE a.f < ${Mm11Frames - 1})""".stripMargin

  private lazy val mm11Sql: String =
    s"""WITH ${mm11BitsCtes("")},
       |${ndSqlPairsCtes("")}
       |SELECT doc_a, doc_b, hamming FROM nd ORDER BY doc_a, doc_b""".stripMargin

  /** mm18: VIDEO fingerprint near-dup — dedup crossing into the video
    * column, completing the modality matrix (text m1, image mm10, audio
    * mm11): each document renders as [[Mm11Frames]] mono frames of
    * B = ⌈len/65⌉ pixels (one row high — the luma-contour geometry;
    * pixels past the text PAD with [[Mm10Pad]], mm10's pad-not-wrap
    * rationale), round-trips through the REAL YUV4MPEG2 container
    * ([[Y4mCodec.encodeY4m]]/[[Y4mCodec.decode]] — mono luma is
    * bit-exact, the mm1 guarantee), and fingerprints as 64 adjacent-
    * frame luma-sum comparisons; all pairs within Hamming ≤ 4 via the
    * same exact banded join. One bit of drift anywhere in the container
    * writer, header parser, frame offsets, or YUV matrix moves a band
    * value and the oracle goes red. */
  def mm18VideoNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
    ndPairs(mm18Fingerprints(docs))
  }

  private def mm18Fingerprints(
      docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      it.map { case (docId, text) =>
        val bytes = asciiBytes(docId, text)
        val b = (bytes.length + Mm11Frames - 1) / Mm11Frames
        val frames = (0 until Mm11Frames).map { f =>
          val img = new java.awt.image.BufferedImage(b, 1,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < b) {
            val idx = f * b + i
            val v = if (idx < bytes.length) bytes(idx) & 0xff else Mm10Pad
            img.setRGB(i, 0, (v << 16) | (v << 8) | v)
            i += 1
          }
          img
        }
        val container = Y4mCodec.encodeY4m(frames, "mono") // REAL bytes
        val v = Y4mCodec.decode(container).getOrElse(
          sys.error(s"mm18: Y4M round-trip failed for doc $docId"))
        val sums = v.frames.map { img =>
          var s = 0L
          var x = 0
          while (x < v.width) { s += img.getRGB(x, 0) & 0xff; x += 1 }
          s
        }
        val bits = new Array[Int](64)
        var f = 0
        while (f < Mm11Frames - 1) {
          bits(f) = if (sums(f + 1) > sums(f)) 1 else 0
          f += 1
        }
        val bd = ndBands(bits)
        (docId, bd(0), bd(1), bd(2), bd(3), bd(4))
      }
    }.toDF("doc_id", "b0", "b1", "b2", "b3", "b4")
  }

  /** mm18's fingerprint-bit CTE chain — mm11's shape with raw byte luma
    * (no PCM scaling, no squaring) and the pad-32 arm. */
  private def mm18BitsCtes(p: String): String =
    s"""${p}d AS (
       |  SELECT doc_id, text, length(text) AS len,
       |    (length(text) + ${Mm11Frames - 1}) // $Mm11Frames AS bb
       |  FROM documents),
       |${p}sm AS (
       |  SELECT doc_id, len, bb, text,
       |    unnest(generate_series(0, $Mm11Frames * bb - 1)) AS i
       |  FROM ${p}d),
       |${p}fe AS (
       |  SELECT doc_id, i // bb AS f,
       |    SUM(CASE WHEN i < len THEN
       |        CAST(ord(substr(text, CAST(i AS INTEGER) + 1, 1)) AS BIGINT)
       |        ELSE $Mm10Pad END) AS e
       |  FROM ${p}sm GROUP BY doc_id, f),
       |${p}bits AS (
       |  SELECT a.doc_id, CAST(a.f AS INTEGER) AS j,
       |    CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
       |  FROM ${p}fe a JOIN ${p}fe b
       |    ON b.doc_id = a.doc_id AND b.f = a.f + 1
       |  WHERE a.f < ${Mm11Frames - 1})""".stripMargin

  private lazy val mm18Sql: String =
    s"""WITH ${mm18BitsCtes("")},
       |${ndSqlPairsCtes("")}
       |SELECT doc_a, doc_b, hamming FROM nd ORDER BY doc_a, doc_b""".stripMargin

  // mm12 feature geometry: the mm2 canvas (24×16, pad-not-wrap like
  // mm10) reduced to an 8×8 grid of 3×2-pixel cells — 64 integer
  // floor-means, the same dimensionality as the embeddings table, so
  // the ANN machinery applies with zero changes.
  private val Mm12W = 24
  private val Mm12H = 16
  private val Mm12CellW = 3
  private val Mm12CellH = 2

  /** Per-document 64-dim image feature vectors from the REAL decode
    * path: render (pad 32), PNG round-trip ([[ImageCodec]]), 8×8
    * integer floor-mean grid over the DECODED pixels. Integer-valued
    * floats, so every downstream double op (distances, centroid means)
    * is exact on both engines. */
  private[graft] def mm12ImageFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, text) =>
          val bytes = asciiBytes(docId, text)
          val img = new java.awt.image.BufferedImage(Mm12W, Mm12H,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < Mm12W * Mm12H) {
            val v = if (i < bytes.length) bytes(i) & 0xff else Mm10Pad
            img.setRGB(i % Mm12W, i / Mm12W, (v << 16) | (v << 8) | v)
            i += 1
          }
          val back = ImageCodec.decode(ImageCodec.encodePng(img)).getOrElse(
            sys.error(s"mm12: PNG round-trip failed for doc $docId"))
          val area = Mm12CellW * Mm12CellH
          val emb = new Array[Float](64)
          var k = 0
          while (k < 64) {
            val r = k / 8; val c = k % 8
            var sum = 0L
            var dy = 0
            while (dy < Mm12CellH) {
              var dx = 0
              while (dx < Mm12CellW) {
                sum += back.getRGB(c * Mm12CellW + dx, r * Mm12CellH + dy) & 0xff
                dx += 1
              }
              dy += 1
            }
            emb(k) = (sum / area).toFloat // integer floor — exact in float
            k += 1
          }
          (docId, emb)
        }
      }.toDF("vec_id", "embedding")
  }

  /** mm12: IMAGE-ANN COMPOSITION — the media features routed through the
    * REAL IVF machinery, proving the ANN tier is modality-agnostic (the
    * a4-is-m1's-sibling argument, now for images): the index is built on
    * [[mm12ImageFeatures]] of docs ≥ 3 ([[graft.operators.IvfSearch
    * .buildIndex]], the i1 quantizer — lowest-id init, cid tie-break,
    * round-6 means), and docs 0–2 probe it as HELD-OUT queries (their
    * vectors are not in the index — the deployment shape, where a query
    * image was never indexed). The oracle rebuilds the features from
    * text bytes in integer arithmetic and replays the ENTIRE i1 CTE
    * chain ([[graft.queries.ScaleOps.ivfCtes]] verbatim — unrolled
    * Lloyd iterations, probe routing, cosine re-rank), so the composed
    * stack (real PNG decode → features → clustering → probe → rank) is
    * hash-verified end to end. */
  def mm12ImageAnn(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.IvfSearch
    import graft.queries.ScaleOps
    // persisted: the corpus side (buildIndex) and the query side
    // (approxTopK's 3 probe rows) both consume the feature frame, and
    // the filters cannot push below the opaque mapPartitions — without
    // the persist the full PNG encode/decode chain runs TWICE per call.
    // Read lazily by the returned plan; Bench/Verify clearCache.
    val feats = mm12ImageFeatures(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = IvfSearch.buildIndex(feats.filter(col("vec_id") >= 3),
      "vec_id", "embedding",
      k = ScaleOps.IvfK, iters = ScaleOps.IvfIters,
      roundDecimals = ScaleOps.IvfRound)
    try {
      val res = IvfSearch.approxTopK(feats.filter(col("vec_id") < 3), idx,
          "vec_id", "embedding",
          k = ScaleOps.IvfTopK, nprobe = ScaleOps.IvfNprobe)
        .orderBy("q_id", "rk")
      // bounded (|queries|·k rows): materialize before closing the index
      s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
    } finally idx.close()
  }

  /** The mm12 feature replay CTE chain (ends in `feats(doc_id, emb)`):
    * pixels, 8×8 cell floor-means, and the ordered double list, all in
    * integer arithmetic from text bytes — shared by mm12's oracle and
    * HybridOps' h11 cross-modal visual leg so the feature definition
    * exists in exactly one SQL place. */
  private[graft] lazy val mm12FeatsCtes: String = {
    val px = Mm12W * Mm12H
    val area = Mm12CellW * Mm12CellH
    s"""d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents),
       |px AS (
       |  SELECT doc_id, len, text,
       |    unnest(generate_series(0, ${px - 1})) AS i
       |  FROM d),
       |cf AS (
       |  SELECT doc_id,
       |    ((i // $Mm12W) // $Mm12CellH) * 8 + (i % $Mm12W) // $Mm12CellW AS k,
       |    SUM(CASE WHEN i < len
       |        THEN ord(substr(text, CAST(i AS INTEGER) + 1, 1))
       |        ELSE $Mm10Pad END) // $area AS v
       |  FROM px GROUP BY doc_id, k),
       |feats AS (
       |  SELECT doc_id, list(CAST(v AS DOUBLE) ORDER BY k) AS emb
       |  FROM cf GROUP BY doc_id)""".stripMargin
  }

  private lazy val mm12Sql: String = {
    s"""WITH $mm12FeatsCtes,
       |e AS (SELECT doc_id AS id, emb FROM feats WHERE doc_id >= 3),
       |q AS (SELECT doc_id AS q_id, emb AS q_emb FROM feats WHERE doc_id < 3),
       |${graft.queries.ScaleOps.ivfCtes},
       |cands AS (
       |  SELECT pr.q_id, pr.q_emb, a.id AS neighbor, a.emb
       |  FROM pr JOIN af a ON a.cid = pr.cid AND a.id <> pr.q_id),
       |scored AS (
       |  SELECT q_id, neighbor,
       |    ROUND(list_dot_product(q_emb, emb) /
       |      (sqrt(list_dot_product(q_emb, q_emb)) * sqrt(list_dot_product(emb, emb))), 6) AS cos
       |  FROM cands),
       |ranked AS (
       |  SELECT q_id, neighbor, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rk
       |  FROM scored)
       |SELECT q_id, neighbor, cos, rk FROM ranked
       |WHERE rk <= ${graft.queries.ScaleOps.IvfTopK}
       |ORDER BY q_id, rk""".stripMargin
  }

  /** mm14/mm15 arrival split: fingerprints below land in the at-rest
    * index; at-or-above arrive later and PROBE it (non-trivial mass on
    * both sides at every SF — 400/100 at sf0.01, 400/4600 at sf0.1). */
  private val Mm14Split = 400L

  /** mm14: the image near-dup gate AT REST — mm10's banded fingerprint
    * table landed ONCE per corpus fingerprint ([[graft.queries.ScaleOps
    * .buildOnce]]: family lock, marker-last, stale-fingerprint prune)
    * and PROBED by arriving documents, the c12/k6 deployment posture
    * crossed into the media tier: an ingest gate asks "is this image a
    * near-dup of anything already landed?" without re-fingerprinting
    * the corpus — the corpus text is never re-read, only the arrival
    * batch is decoded, and the probe is an equi-join of the (tiny)
    * arrival band rows against the landed band table (broadcast —
    * arrival batches are small by definition; recall stays EXACT at
    * Hamming ≤ 4 by the pigeonhole argument, per band class). Output:
    * (landed doc_a, arriving doc_b, hamming) — the gate's drop list.
    * Oracle: mm10's full pair chain restricted to cross-split pairs
    * (doc_a < split ≤ doc_b — the banded index finds exactly the
    * all-pairs answer on that slice). */
  def mm14ImageNeardupAtRest(s: SparkSession, dir: String): DataFrame =
    ndGateAtRest(s, dir, "mm14s", mm10Fingerprints)

  /** The at-rest near-dup gate mm14 (image) and mm15 (audio) share:
    * the banded fingerprint table of docs below [[Mm14Split]] landed
    * once per corpus fingerprint under `family`, probed by the
    * at-or-above arrivals via a broadcast band equi-join. One copy of
    * the land/probe/Hamming logic — the fingerprint function is the
    * only thing that differs between modalities. */
  private def ndGateAtRest(s: SparkSession, dir: String, family: String,
      fingerprints: org.apache.spark.sql.Dataset[(Long, String)] => DataFrame): DataFrame = {
    import s.implicits._
    import graft.queries.ScaleOps
    val root = ScaleOps.artifactRoot(family,
      ScaleOps.dataFingerprint(dir, Seq("documents")))
    val table = root.resolve("bands").toString
    ScaleOps.buildOnce(family, root) {
      val t = s.newSession()
      import t.implicits._
      val corpus = graft.Tables(t, dir, "documents")
        .filter(col("doc_id") < Mm14Split)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      ndBanded(fingerprints(corpus))
        .write.mode("overwrite").partitionBy("t").parquet(table)
    }
    val landed = s.read.parquet(table)
    val arrivals = graft.Tables(s, dir, "documents")
      .filter(col("doc_id") >= Mm14Split)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    // arrival side: persist + eager count — it feeds every band bucket
    // of the join and would otherwise re-decode per shuffle-map stage
    val probe = ndBanded(fingerprints(arrivals))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probe.count()
    val hamming = ndHamming
    landed.as("a").join(broadcast(probe.as("b")),
        col("a.t") === col("b.t") && col("a.bv") === col("b.bv"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .filter(col("hamming") <= MmNdMaxHamming)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  private lazy val mm14Sql: String =
    s"""WITH ${mm10BitsCtes("")},
       |${ndSqlPairsCtes("")}
       |SELECT doc_a, doc_b, hamming FROM nd
       |WHERE doc_a < $Mm14Split AND doc_b >= $Mm14Split
       |ORDER BY doc_a, doc_b""".stripMargin

  /** mm15: the AUDIO near-dup gate AT REST — mm14's deployment posture
    * for the audio modality: mm11's banded energy-contour fingerprints
    * of the landed corpus built once per corpus fingerprint
    * ([[graft.queries.ScaleOps.buildOnce]] via [[ndGateAtRest]] — one
    * copy of the gate shared with mm14), probed by arriving documents.
    * Only the arrival batch renders/round-trips PCM; recall stays EXACT
    * at Hamming ≤ 4 by the per-band pigeonhole. Output: (landed doc_a,
    * arriving doc_b, hamming). Oracle: mm11's full pair chain
    * restricted to cross-split pairs. */
  def mm15AudioNeardupAtRest(s: SparkSession, dir: String): DataFrame =
    ndGateAtRest(s, dir, "mm15s", mm11Fingerprints)

  private lazy val mm15Sql: String =
    s"""WITH ${mm11BitsCtes("")},
       |${ndSqlPairsCtes("")}
       |SELECT doc_a, doc_b, hamming FROM nd
       |WHERE doc_a < $Mm14Split AND doc_b >= $Mm14Split
       |ORDER BY doc_a, doc_b""".stripMargin

  /** mm16 wave count — c9's three-wave convention (doc_id mod 3, so
    * near-dup partners arrive in different waves and in both orders). */
  private val Mm16Batches = 3

  /** mm16: ROLLING image near-dup — the continuous form of the whole
    * image-dedup tier (mm10's sweep + mm14's gate as a STREAM): three
    * ingest waves drive [[graft.streaming.StreamOps.imageNdBatch]] —
    * each wave decodes only its arrivals, sweeps them against the
    * accumulated band state, and lands pair + fingerprint deltas — and
    * the read is the lineage question: the pair log AS OF waves 1 and 2
    * ([[graft.streaming.StreamOps.imageNdAsOf]]). Because the sweep
    * finds each pair exactly once at its later endpoint's wave, the
    * as-of sets are found_at-prefixes of mm10's one-shot answer — which
    * is precisely what the oracle replays (the full nd chain plus
    * found_at = greatest(doc_a mod 3, doc_b mod 3)). The wave drive
    * lands AT MOST ONCE per corpus fingerprint (the g2s discipline);
    * serving reads only the landed pair log. */
  def mm16RollingImageNeardup(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    rollingNd(s, dir, "mm16s", StreamOps.imageNdBatch, StreamOps.imageNdAsOf)
  }

  /** The rolling-drive protocol mm16 (image) and mm17 (audio) share —
    * one copy of the wave loop, the k13s delete-before-rebuild rule,
    * the as-of frontier read, and the c20 materialize rule; the
    * per-batch and as-of functions are the only modality difference. */
  private def rollingNd(s: SparkSession, dir: String, family: String,
      batchFn: (DataFrame, String, Long) => DataFrame,
      asOfFn: (SparkSession, String, Long) => DataFrame): DataFrame = {
    val state = rollingNdState(s, dir, family, batchFn)
    def frontier(n: Long) = asOfFn(s, state, n)
      .select(lit(n).as("as_of"), col("doc_a"), col("doc_b"), col("hamming"))
    val res = frontier(1L).unionByName(frontier(2L))
      .orderBy(col("as_of"), col("doc_a"), col("doc_b"))
    // bounded (the pair log): materialize before returning (the c20 rule
    // for artifact-served lazy frames)
    s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
  }

  /** The landed rolling-family state path for `family`, driving the
    * waves first if this corpus fingerprint has none (buildOnce) —
    * shared by the mm16/mm17 lineage reads and mm13's composition. */
  private def rollingNdState(s: SparkSession, dir: String, family: String,
      batchFn: (DataFrame, String, Long) => DataFrame): String = {
    import graft.queries.ScaleOps
    val root = ScaleOps.artifactRoot(family,
      ScaleOps.dataFingerprint(dir, Seq("documents")))
    val state = root.resolve("state").toString
    ScaleOps.buildOnce(family, root) {
      // marker-less root deleted before rebuild (the k13s rule for
      // multi-batch builders over delta-family state)
      graft.sources.Sources.deleteRecursively(root.toFile)
      val t = s.newSession()
      val docs = graft.Tables(t, dir, "documents")
        .select(col("doc_id"), col("text"))
      (0 until Mm16Batches).foreach { b =>
        batchFn(
          docs.filter(pmod(col("doc_id"), lit(Mm16Batches.toLong)) === b.toLong),
          state, b.toLong)
      }
    }
    state
  }

  /** The found_at replay tail mm16Sql/mm17Sql share, parameterized on
    * the modality's fingerprint-bit CTE chain (the ndSqlPairsCtes
    * pattern): the full pair chain plus per-frontier found_at cuts. */
  private def ndRollingSql(bitsCtes: String): String =
    s"""WITH $bitsCtes,
       |${ndSqlPairsCtes("")},
       |fa AS (
       |  SELECT doc_a, doc_b, hamming,
       |    greatest(doc_a % $Mm16Batches, doc_b % $Mm16Batches) AS found_at
       |  FROM nd)
       |SELECT CAST(1 AS BIGINT) AS as_of, doc_a, doc_b, hamming
       |FROM fa WHERE found_at <= 1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), doc_a, doc_b, hamming
       |FROM fa WHERE found_at <= 2
       |ORDER BY as_of, doc_a, doc_b""".stripMargin

  private lazy val mm16Sql: String = ndRollingSql(mm10BitsCtes(""))

  /** mm17: mm16's protocol for the AUDIO modality — the rolling
    * energy-contour near-dup stream ([[graft.streaming.StreamOps
    * .audioNdBatch]], one shared land/sweep body with the image
    * family): three waves, only arrivals render PCM, pair log as of
    * waves 1 and 2. The oracle is mm11's chain plus the same found_at
    * arithmetic. */
  def mm17RollingAudioNeardup(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    rollingNd(s, dir, "mm17s", StreamOps.audioNdBatch, StreamOps.audioNdAsOf)
  }

  private lazy val mm17Sql: String = ndRollingSql(mm11BitsCtes(""))

  /** mm19: mm16's protocol for the VIDEO modality — the rolling
    * frame-luma-contour near-dup stream ([[graft.streaming.StreamOps
    * .videoNdBatch]], the same shared land/sweep body): three waves,
    * only arrivals render and Y4M-round-trip, pair log as of waves 1
    * and 2. With mm16/mm17 this lands ALL THREE media near-dup sweeps
    * as rolling families — which is also what lets mm13 read every leg
    * from landed state. */
  def mm19RollingVideoNeardup(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    rollingNd(s, dir, "mm19s", StreamOps.videoNdBatch, StreamOps.videoNdAsOf)
  }

  private lazy val mm19Sql: String = ndRollingSql(mm18BitsCtes(""))

  /** mm13's text-leg threshold — m1's own (the corpus near-dup
    * convention every dedup row shares). */
  private val Mm13TextThreshold = 0.3

  /** mm13: MULTIMODAL DUP CLUSTERS — the keep/drop unit ACROSS
    * modalities: text near-dup edges (m1's MinHash sweep), image edges
    * (mm10's banded dHash), audio edges (mm11's banded energy
    * fingerprint), and video edges (mm18's banded frame-luma contour)
    * union into ONE graph, and [[graft.operators.ConnectedComponents]]
    * resolves it into clusters — a 100 TB multimodal training set
    * dedups its images, audio, and video the same way it dedups text,
    * and a pair invisible to one modality (paraphrased caption, same
    * artwork) still collapses when another modality links it. Per
    * cluster: member count plus the per-modality edge evidence (which
    * signals hold the cluster together — the reviewer's first question
    * about any cross-modal merge). Scale shape: each leg is its own
    * banded/blocked sweep (never all-pairs), the union is edge-count-
    * sized, and CC is the star-collapse loop every c-family row already
    * rides. The oracle replays ALL FOUR pair chains (m1's MinHash CTEs,
    * the prefixed mm10/mm11/mm18 chains), the union, a recursive
    * transitive closure, and the evidence rollup. */
  def mm13MultimodalClusters(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    // every leg reads a LANDED pair artifact — the sweeps themselves are
    // priced by their own rows (m1, mm10/mm16, mm11/mm17, mm18/mm19); a
    // composition that re-shingled and re-decoded the corpus per call
    // would pay the whole dedup tier several times over (measured 7.0 s
    // → sub-second for the first three legs alone).
    // Text: g1s's symmetric m1 edge list at the SAME 0.3 threshold
    // (Mm13TextThreshold == the corpus NearDupThreshold), folded back to
    // the id_a < id_b pair form. Image/audio/video: the mm16s/mm17s/
    // mm19s rolling pair logs, whose full-frontier union IS the one-shot
    // mm10/mm11/mm18 answer (the exactly-once sweep identity,
    // spec-pinned).
    val text = s.read
      .parquet(s"${graft.queries.CorpusOps.g1EdgeRoot(s, dir)}/edges")
      .filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"),
        lit("text").as("modality"))
    val img = StreamOps.imageNdAsOf(s,
        rollingNdState(s, dir, "mm16s", StreamOps.imageNdBatch),
        asOf = Mm16Batches - 1L)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        lit("image").as("modality"))
    val aud = StreamOps.audioNdAsOf(s,
        rollingNdState(s, dir, "mm17s", StreamOps.audioNdBatch),
        asOf = Mm16Batches - 1L)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        lit("audio").as("modality"))
    val vid = StreamOps.videoNdAsOf(s,
        rollingNdState(s, dir, "mm19s", StreamOps.videoNdBatch),
        asOf = Mm16Batches - 1L)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        lit("video").as("modality"))
    // eager checkpoint: the edge union feeds BOTH the CC loop and the
    // evidence rollup, and the rows must pin off the artifact files
    // before any concurrent fingerprint prune (the c20 rule)
    val edges = text.unionByName(img).unionByName(aud).unionByName(vid)
      .localCheckpoint()
    val comps = graft.operators.ConnectedComponents
      .components(edges.select(col("id_a"), col("id_b")))
    val sizes = comps.groupBy(col("component")).agg(count(lit(1)).as("n_docs"))
    // an edge's component is either endpoint's (same by construction)
    val evidence = edges
      .join(comps.select(col("id").as("id_a"), col("component")), Seq("id_a"))
      .groupBy(col("component"))
      .agg(
        sum(when(col("modality") === "text", 1L).otherwise(0L)).as("n_text_edges"),
        sum(when(col("modality") === "image", 1L).otherwise(0L)).as("n_image_edges"),
        sum(when(col("modality") === "audio", 1L).otherwise(0L)).as("n_audio_edges"),
        sum(when(col("modality") === "video", 1L).otherwise(0L)).as("n_video_edges"))
    sizes.join(evidence, Seq("component")).orderBy("component")
  }

  private lazy val mm13Sql: String =
    s"""WITH RECURSIVE ${graft.queries.ScaleOps.m1PairsCtesAt(Mm13TextThreshold)},
       |${mm10BitsCtes("i_")},
       |${ndSqlPairsCtes("i_")},
       |${mm11BitsCtes("a_")},
       |${ndSqlPairsCtes("a_")},
       |${mm18BitsCtes("v_")},
       |${ndSqlPairsCtes("v_")},
       |med AS (
       |  SELECT id_a, id_b, 'text' AS modality FROM fpairs
       |  UNION ALL
       |  SELECT doc_a, doc_b, 'image' FROM i_nd
       |  UNION ALL
       |  SELECT doc_a, doc_b, 'audio' FROM a_nd
       |  UNION ALL
       |  SELECT doc_a, doc_b, 'video' FROM v_nd),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM med
       |  UNION
       |  SELECT id_b, id_a FROM med),
       |reach(id, r) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
       |clusters AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |cnt AS (SELECT component, COUNT(*) AS n_docs FROM clusters GROUP BY component),
       |em AS (
       |  SELECT c.component,
       |    CAST(SUM(CASE WHEN modality = 'text' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_text_edges,
       |    CAST(SUM(CASE WHEN modality = 'image' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_image_edges,
       |    CAST(SUM(CASE WHEN modality = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_audio_edges,
       |    CAST(SUM(CASE WHEN modality = 'video' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_video_edges
       |  FROM med m JOIN clusters c ON c.id = m.id_a
       |  GROUP BY c.component)
       |SELECT cnt.component, cnt.n_docs,
       |  em.n_text_edges, em.n_image_edges, em.n_audio_edges, em.n_video_edges
       |FROM cnt JOIN em USING (component)
       |ORDER BY component""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_video_luma" -> (mm1VideoLuma _),
    "mm2_image_luma" -> (mm2ImageLuma _),
    "mm3_audio_sum" -> (mm3AudioSum _),
    "mm4_audio_features" -> (mm4AudioFeatures _),
    "mm5_image_resize" -> (mm5ImageResize _),
    "mm6_scene_change" -> (mm6SceneChange _),
    "mm7_audio_wht" -> (mm7AudioWht _),
    "mm8_block_motion" -> (mm8BlockMotion _),
    "mm9_motion_gain" -> (mm9MotionGain _),
    "mm10_image_neardup" -> (mm10ImageNearDup _),
    "mm11_audio_neardup" -> (mm11AudioNearDup _),
    "mm12_image_ann" -> (mm12ImageAnn _),
    "mm13_multimodal_clusters" -> (mm13MultimodalClusters _),
    "mm14_image_neardup_at_rest" -> (mm14ImageNeardupAtRest _),
    "mm15_audio_neardup_at_rest" -> (mm15AudioNeardupAtRest _),
    "mm16_rolling_image_neardup" -> (mm16RollingImageNeardup _),
    "mm17_rolling_audio_neardup" -> (mm17RollingAudioNeardup _),
    "mm18_video_neardup" -> (mm18VideoNearDup _),
    "mm19_rolling_video_neardup" -> (mm19RollingVideoNeardup _))

  val oracles: Map[String, String] = Map(
    "mm1_video_luma" -> mm1Sql,
    "mm2_image_luma" -> mm2Sql,
    "mm3_audio_sum" -> mm3Sql,
    "mm4_audio_features" -> mm4Sql,
    "mm5_image_resize" -> mm5Sql,
    "mm6_scene_change" -> mm6Sql,
    "mm7_audio_wht" -> mm7Sql,
    "mm8_block_motion" -> mm8Sql,
    "mm9_motion_gain" -> mm9Sql,
    "mm10_image_neardup" -> mm10Sql,
    "mm11_audio_neardup" -> mm11Sql,
    "mm12_image_ann" -> mm12Sql,
    "mm13_multimodal_clusters" -> mm13Sql,
    "mm14_image_neardup_at_rest" -> mm14Sql,
    "mm15_audio_neardup_at_rest" -> mm15Sql,
    "mm16_rolling_image_neardup" -> mm16Sql,
    "mm17_rolling_audio_neardup" -> mm17Sql,
    "mm18_video_neardup" -> mm18Sql,
    "mm19_rolling_video_neardup" -> mm19Sql)
}
