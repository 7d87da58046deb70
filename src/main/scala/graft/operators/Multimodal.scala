package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video content travels as an
  * opaque `binary` column with typed metadata; decode / feature-extract run
  * as batch functions over partitions (the Scala analog of a vectorised
  * Pandas UDF: one JVM call per partition iterator, not per row).
  *
  * The DECODE path is REAL: [[decodeImage]] runs the JDK's
  * `javax.imageio.ImageIO` codec (PNG/JPEG/BMP/GIF ship with the JVM — no
  * external library) and extracts dimensions, channel count, mean
  * luminance, and a banded luma histogram from the actual pixel raster;
  * [[resizeTo]] really resamples through `Graphics2D.drawImage`. What IS
  * synthetic is the image bytes themselves: the test corpus has no image
  * column, so [[encodePng]] deterministically renders each document's
  * payload into a small gradient PNG first (in production the binary
  * column already holds camera/scraper bytes and that step disappears).
  * The synthesis is arithmetic in (payload length, first/last byte), which
  * is what lets a SQL oracle verify the real codec path end-to-end: the
  * decoded features must land exactly on the closed-form values.
  *
  * Scale shape: per-partition `mapPartitions` batches (codec state and
  * buffers amortise per batch, rows stream), no shuffle introduced by
  * decode, and features are fixed-width rows regardless of payload size —
  * the 100 TB posture is "decode where the bytes already are".
  */
object Multimodal {

  /** A binary payload row: what an image/audio ingestion table looks like. */
  case class Payload(doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Decoded per-item features: real raster measurements. `brightness` is
    * the mean integer BT.601 luma over all pixels (floor division). */
  case class Features(doc_id: Long, width: Long, height: Long, channels: Long, brightness: Long)

  /** Full decode result: dimensions, bands, luma sum and 8-bucket banded
    * luma histogram (bucket = luma div 32) straight off the raster. */
  case class Decoded(width: Int, height: Int, channels: Int, lumaSum: Long, hist: Array[Long])

  /** Deterministic synthetic PNG for a payload — the fixture's stand-in
    * for stored image bytes. Geometry and fill are closed-form in the
    * payload so the oracle can predict what the REAL decoder must read
    * back: width 16 + n%32, height 16 + 7n%32, solid-gradient gray
    * pixels v = base + x + y with base = (first+last byte) % 160
    * (base<=159, x+y<=92 keeps v<=251 — no 8-bit wrap, so the arithmetic
    * mirror needs no modulo case analysis). */
  def encodePng(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val w = 16 + n % 32
    val h = 16 + ((n.toLong * 7L) % 32L).toInt
    val base =
      if (n > 0) ((payload(0) & 0xff) + (payload(n - 1) & 0xff)) % 160 else 0
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = base + x + y
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode through the JDK codec: parse the container, walk
    * the pixel raster, measure dims/bands/luma. Luma is integer BT.601
    * ((299R + 587G + 114B) div 1000) so results are bit-exact across
    * JVMs and mirrorable in SQL. Throws on undecodable bytes — garbage
    * in an image column should fail loudly, not yield fake features
    * (callers wanting error isolation wrap with the same quarantine
    * pattern as the CSV pipeline's error_isolation operator). */
  def decodeImage(bytes: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val channels = img.getRaster.getNumBands
    val hist = new Array[Long](8)
    var lumaSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        lumaSum += luma
        hist(luma >> 5) += 1
        x += 1
      }
      y += 1
    }
    Decoded(w, h, channels, lumaSum, hist)
  }

  /** documents -> payload table: binary column + typed metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"))

  /** Partition-wise batch decode (mapPartitions = the Pandas-UDF batch
    * shape: amortised per-batch setup, streaming iterator, no per-row
    * closure dispatch). encode→decode per row: the PNG round-trip means
    * every feature below passed through the real codec. */
  def decodeAll(spark: SparkSession, docs: DataFrame): Dataset[Features] = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.map { p =>
        val d = decodeImage(encodePng(p.payload))
        Features(p.doc_id, d.width.toLong, d.height.toLong, d.channels.toLong,
          d.lumaSum / (d.width.toLong * d.height.toLong))
      }
    }
  }

  /** Banded luma histogram per image, long form (doc_id, bucket, n_px),
    * non-empty buckets only — the per-image pixel-statistics pass a
    * vision-data curation pipeline runs (exposure/contrast screens).
    * Buckets are luma div 32 (8 bands over 0..255), counted from the
    * decoded raster. */
  def lumaHistogram(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.flatMap { p =>
        val d = decodeImage(encodePng(p.payload))
        d.hist.iterator.zipWithIndex.collect {
          case (npx, b) if npx > 0 => (p.doc_id, b.toLong, npx)
        }
      }
    }.toDF("doc_id", "bucket", "n_px")
  }

  /** Perceptual average-hash (aHash) off the REAL decoded raster: an
    * 8×8 nearest-neighbour grid sample (sample point (gx·w div 8,
    * gy·h div 8) — integer floor arithmetic, so the oracle can predict
    * every sampled pixel in closed form), bit i set when the sampled
    * luma beats the 64-sample mean — compared as 64·v > Σv, no
    * division, engine-exact. The 64-bit hash ships as two non-negative
    * 32-bit halves (ah_hi, ah_lo) so no sign games are needed in
    * either engine. This is the image near-dup key: identical visual
    * structure hashes identically regardless of byte-level encoding. */
  case class AHash(doc_id: Long, width: Long, height: Long, ah_hi: Long, ah_lo: Long)

  def aHashAll(spark: SparkSession, docs: DataFrame): Dataset[AHash] = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.map { p =>
        val img = ImageIO.read(new ByteArrayInputStream(encodePng(p.payload)))
        require(img != null, "payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val vs = new Array[Long](64)
        var i = 0
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8) {
            val rgb = img.getRGB(gx * w / 8, gy * h / 8)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            vs(i) = (299L * r + 587L * g + 114L * b) / 1000L
            i += 1
            gx += 1
          }
          gy += 1
        }
        val sum = vs.sum
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < 64) {
          if (64L * vs(i) > sum) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        AHash(p.doc_id, w.toLong, h.toLong, hi, lo)
      }
    }
  }

  /** REAL resize: decode, fit into a `box`×`box` bounding region
    * preserving aspect ratio (integer floor arithmetic picks the target
    * dims — exactly mirrorable in SQL), then resample the pixels through
    * `Graphics2D.drawImage` into a fresh raster. Output reports the
    * resampled image's OWN dimensions — if the resample didn't happen,
    * the numbers would not exist to read. Degenerate aspect ratios clamp
    * to >=1px (mirrored with GREATEST in the oracle). */
  def resizeTo(spark: SparkSession, docs: DataFrame, box: Int): DataFrame = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.map { p =>
        val src = ImageIO.read(new ByteArrayInputStream(encodePng(p.payload)))
        val w = src.getWidth.toLong
        val h = src.getHeight.toLong
        val (tw, th) =
          if (w <= box && h <= box) (w, h)
          else if (w >= h) (box.toLong, math.max(1L, (h * box) / w))
          else (math.max(1L, (w * box) / h), box.toLong)
        val dst = new BufferedImage(tw.toInt, th.toInt, BufferedImage.TYPE_3BYTE_BGR)
        val g = dst.createGraphics()
        try g.drawImage(src, 0, 0, tw.toInt, th.toInt, null) finally g.dispose()
        (p.doc_id, w, h, dst.getWidth.toLong, dst.getHeight.toLong)
      }
    }.toDF("doc_id", "width", "height", "rw", "rh")
  }

  /** Decoded per-clip audio measurements, all integer: real container
    * parse (sample rate, channels, bit depth, frame count) plus waveform
    * statistics accumulated from the decoded PCM samples. */
  case class AudioFeatures(doc_id: Long, sample_rate: Long, channels: Long,
                           bits: Long, n_samples: Long, sum_amp: Long, energy: Long)

  /** Deterministic synthetic WAV for a payload — the audio analog of
    * [[encodePng]]: 16-bit signed little-endian mono PCM at 8 kHz, with
    * n = 1000 + n_bytes % 4000 samples on the ramp a(t) = base + t,
    * base = (first+last byte) % 1000. Values stay within 0..5998 (no
    * 16-bit wrap), so sum and energy have closed forms the oracle
    * mirrors. */
  def encodeWav(payload: Array[Byte]): Array[Byte] = {
    val nb = payload.length
    val n = 1000 + nb % 4000
    val base =
      if (nb > 0) ((payload(0) & 0xff) + (payload(nb - 1) & 0xff)) % 1000 else 0
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val a = base + t
      pcm(2 * t) = (a & 0xff).toByte
      pcm(2 * t + 1) = ((a >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode through the JDK's sampled-audio codec: parse the
    * WAV container, stream the PCM frames, accumulate integer waveform
    * statistics (sum of amplitudes, sum of squares). Throws on
    * undecodable bytes, same loud-failure contract as [[decodeImage]]. */
  def decodeAudio(docId: Long, bytes: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"unsupported PCM shape: $fmt")
      val frameBytes = fmt.getFrameSize
      val buf = new Array[Byte](frameBytes * 1024)
      var sum = 0L
      var energy = 0L
      var nSamples = 0L
      var read = ais.read(buf)
      while (read > 0) {
        var i = 0
        while (i + 1 < read) {
          val a = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort.toLong
          sum += a
          energy += a * a
          nSamples += 1
          i += 2
        }
        read = ais.read(buf)
      }
      AudioFeatures(docId, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
        fmt.getSampleSizeInBits.toLong, nSamples, sum, energy)
    } finally ais.close()
  }

  /** Partition-wise batch audio decode — encode→decode per row, so every
    * statistic passed through the real sampled-audio codec. */
  def decodeAllAudio(spark: SparkSession, docs: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.map(p => decodeAudio(p.doc_id, encodeWav(p.payload)))
    }
  }

  /** Per-clip silence profile: doc, decoded sample count, number of
    * silent segments, total silent samples, longest silent run. */
  case class AudioSilence(doc_id: Long, n_samples: Long, n_segments: Long,
                          n_silent: Long, longest_run: Long)

  /** Gapped variant of [[encodeWav]]: every 4th 100-sample block is
    * zeroed — deterministic embedded silence so a detector has real
    * structure to find, with closed-form block geometry the oracle
    * mirrors (non-silent samples are base + t ≥ 100 > 0, so exact-zero
    * IS the silence predicate). */
  def encodeWavGapped(payload: Array[Byte]): Array[Byte] = {
    val nb = payload.length
    val n = 1000 + nb % 4000
    val base =
      if (nb > 0) ((payload(0) & 0xff) + (payload(nb - 1) & 0xff)) % 1000 else 0
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val a = if ((t / 100) % 4 == 0) 0 else base + t
      pcm(2 * t) = (a & 0xff).toByte
      pcm(2 * t + 1) = ((a >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Silence-run detection over REAL decoded PCM: stream the frames
    * through the JDK codec and fold runs of zero samples imperatively —
    * the per-clip scan stays inside the partition batch (no per-sample
    * explode, no shuffle introduced by detection; the standard shape for
    * audio feature extraction over a corpus: codec + scan per row,
    * aggregate later if needed). */
  def silenceProfile(docId: Long, bytes: Array[Byte]): AudioSilence = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
        s"unsupported PCM shape: $fmt")
      val buf = new Array[Byte](fmt.getFrameSize * 1024)
      var nSamples = 0L; var nSilent = 0L; var nSegments = 0L
      var run = 0L; var longest = 0L
      var read = ais.read(buf)
      while (read > 0) {
        var i = 0
        while (i + 1 < read) {
          val a = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort.toLong
          if (a == 0L) {
            if (run == 0L) nSegments += 1
            run += 1
            nSilent += 1
            if (run > longest) longest = run
          } else run = 0L
          nSamples += 1
          i += 2
        }
        read = ais.read(buf)
      }
      AudioSilence(docId, nSamples, nSegments, nSilent, longest)
    } finally ais.close()
  }

  /** Partition-wise batch silence detection over the gapped synth WAVs —
    * every statistic passes through the real sampled-audio codec. */
  def silenceAll(spark: SparkSession, docs: DataFrame): Dataset[AudioSilence] = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.map(p => silenceProfile(p.doc_id, encodeWavGapped(p.payload)))
    }
  }

  /** Frame-sampling stub for video-like payloads: every k-th byte stands in
    * for every k-th frame; keeps the explode/array plumbing honest (a real
    * video demuxer needs codecs the JDK does not ship — the one remaining
    * synthetic decode in this family, and documented as such). */
  def frameSample(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    withPayload(docs).as[Payload].mapPartitions { it =>
      it.flatMap { p =>
        p.payload.indices.by(k).map(i => (p.doc_id, i.toLong, p.payload(i) & 0xffL))
      }
    }.toDF("doc_id", "frame_idx", "sample")
  }
}
