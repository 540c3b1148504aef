package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.kg.PagesSource.mix64

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in executor-side batches.
  *
  * Round 3: the decode is REAL (no more stub). The sandbox has no codec
  * libraries, so the media corpus is synthesized in pure-JVM formats whose
  * codecs fit in ~40 lines each — BMP (24-bit uncompressed) for images, WAV
  * (PCM16 mono) for audio, and a concatenated-P6-PPM stream for video — and
  * [[decode]] parses the actual container bytes: magic sniffing, little-
  * endian header fields, ASCII PPM headers, and full-payload statistics
  * (pixel-byte sums / signed sample sums). Generation and parsing are
  * separate code paths over the wire format, so a header-layout or
  * endianness bug breaks the tests and the driver oracle (the oracle
  * recomputes the expected features from the generator's arithmetic in
  * DuckDB SQL — see SparkEntry.mmFeaturesOracle).
  *
  * Execution shape (unchanged, the actual Spark lesson): mapPartitions
  * keeps per-batch decoder state alive across rows — the same shape as a
  * mapInPandas batch UDF — and the binary column never rides through a
  * shuffle wider than its own row.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int, // image/video frame width; 0 for audio
      height: Int, // image/video frame height; 0 for audio
      sample_rate: Int, // audio only; 0 otherwise
      n_units: Long, // pixels (image) / samples (audio) / frames (video)
      content_sum: Long, // Σ payload bytes (unsigned) or Σ samples (signed)
      histogram: Array[Long]) // 16-bin payload-byte histogram

  // ------------------------------------------------------------ synthesis

  /** Deterministic payload byte j for media seeded by `dataSeed`. */
  @inline private def payloadByte(dataSeed: Long, j: Long): Int =
    (mix64(dataSeed + j) & 0xFF).toInt

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
    b(off + 2) = ((v >>> 16) & 0xFF).toByte
    b(off + 3) = ((v >>> 24) & 0xFF).toByte
  }
  private def putLeShort(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
  }

  /** Valid 24-bit uncompressed BMP; dimensions and pixels are pure
    * functions of the media id. */
  def synthBmp(id: Long): Array[Byte] = {
    val w = 4 + (mix64(id ^ 0xB1L) & 0x1F).toInt // 4..35
    val h = 4 + (mix64(id ^ 0xB2L) & 0x1F).toInt
    val rowSize = ((3 * w + 3) / 4) * 4 // rows padded to 4 bytes
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLeInt(out, 2, 54 + dataSize) // file size
    putLeInt(out, 10, 54) // pixel-data offset
    putLeInt(out, 14, 40) // BITMAPINFOHEADER size
    putLeInt(out, 18, w)
    putLeInt(out, 22, h)
    putLeShort(out, 26, 1) // planes
    putLeShort(out, 28, 24) // bpp
    putLeInt(out, 34, dataSize)
    putLeInt(out, 38, 2835); putLeInt(out, 42, 2835) // 72 DPI
    val seed = mix64(id ^ 0x5EEDFACEL)
    var j = 0
    while (j < dataSize) { out(54 + j) = payloadByte(seed, j).toByte; j += 1 }
    out
  }

  /** Valid WAV (RIFF, PCM16 mono); rate and samples are pure functions of
    * the media id. */
  def synthWav(id: Long): Array[Byte] = {
    val sampleRate = 8000 + ((mix64(id ^ 0xA1L) & 7) * 1000).toInt
    val nSamples = 256 + (mix64(id ^ 0xA2L) & 0x3FF).toInt // 256..1279
    val dataSize = nSamples * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLeInt(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLeInt(out, 16, 16) // fmt chunk size
    putLeShort(out, 20, 1) // PCM
    putLeShort(out, 22, 1) // mono
    putLeInt(out, 24, sampleRate)
    putLeInt(out, 28, sampleRate * 2) // byte rate
    putLeShort(out, 32, 2) // block align
    putLeShort(out, 34, 16) // bits/sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLeInt(out, 40, dataSize)
    val seed = mix64(id ^ 0x5EEDFACEL)
    var j = 0
    while (j < nSamples) {
      val s = (mix64(seed + j) & 0xFFFF).toShort // signed PCM sample
      putLeShort(out, 44 + 2 * j, s & 0xFFFF)
      j += 1
    }
    out
  }

  /** "Video": a stream of concatenated binary-PPM (P6) frames of identical
    * dimensions — the simplest container a frame sampler can seek through
    * by parsing each ASCII header. */
  def synthVideo(id: Long): Array[Byte] = {
    val nFrames = 2 + (mix64(id ^ 0xC1L) & 7).toInt // 2..9
    val w = 4 + (mix64(id ^ 0xC2L) & 0xF).toInt // 4..19
    val h = 4 + (mix64(id ^ 0xC3L) & 0xF).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val frameData = 3 * w * h
    val out = new Array[Byte](nFrames * (header.length + frameData))
    val seed = mix64(id ^ 0x5EEDFACEL)
    var off = 0
    var f = 0
    while (f < nFrames) {
      System.arraycopy(header, 0, out, off, header.length)
      off += header.length
      var j = 0
      while (j < frameData) {
        out(off + j) = payloadByte(seed, f.toLong * frameData + j).toByte
        j += 1
      }
      off += frameData
      f += 1
    }
    out
  }

  def synthMedia(id: Long, kind: String): Array[Byte] = kind match {
    case "audio" => synthWav(id)
    case "video" => synthVideo(id)
    case _       => synthBmp(id)
  }

  // -------------------------------------------------------------- decode

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** (width, height, sampleRate, nUnits, contentSum, histogram) from the
    * container bytes; format decided by magic sniffing, not by the `kind`
    * metadata column. Throws on malformed input — a real decoder's contract
    * (the pipeline wraps per-row failures where it must tolerate them). */
  def decode(content: Array[Byte]): (Int, Int, Int, Long, Long, Array[Long]) = {
    val hist = new Array[Long](16)
    if (content.length >= 54 && content(0) == 'B' && content(1) == 'M') {
      val offset = leInt(content, 10)
      val w = leInt(content, 18)
      val h = leInt(content, 22)
      require(leShort(content, 28) == 24, "only 24bpp BMP supported")
      // header-declared offset is untrusted: out-of-range must fail as
      // IllegalArgumentException like every other malformed-container path,
      // not as an ArrayIndexOutOfBounds the callers don't catch
      require(offset >= 54 && offset <= content.length,
        s"BMP pixel offset $offset out of range (${content.length} bytes)")
      var sum = 0L
      var j = offset
      while (j < content.length) {
        val v = content(j) & 0xFF
        sum += v; hist(v >>> 4) += 1; j += 1
      }
      (w, h, 0, w.toLong * h, sum, hist)
    } else if (content.length >= 44 && content(0) == 'R' && content(1) == 'I' &&
        content(2) == 'F' && content(3) == 'F') {
      require(leShort(content, 20) == 1 && leShort(content, 34) == 16,
        "only PCM16 WAV supported")
      val sampleRate = leInt(content, 24)
      val dataSize = leInt(content, 40)
      // untrusted declared size: a truncated container must throw the same
      // IllegalArgumentException as the unknown-container path
      require(dataSize >= 0 && 44L + dataSize <= content.length,
        s"WAV data chunk $dataSize bytes exceeds container (${content.length} bytes)")
      val n = dataSize / 2
      var sum = 0L
      var j = 0
      while (j < n) {
        val s = leShort(content, 44 + 2 * j).toShort // sign-extend
        sum += s
        hist((s & 0xFF) >>> 4) += 1 // low byte histogram
        j += 1
      }
      (0, 0, sampleRate, n.toLong, sum, hist)
    } else if (content.length >= 2 && content(0) == 'P' && content(1) == '6') {
      // concatenated PPM frames: parse each ASCII header, skip its payload
      var off = 0
      var frames = 0L
      var w = 0; var h = 0
      var sum = 0L
      while (off < content.length) {
        val (fw, fh, dataOff) = ppmHeader(content, off)
        if (frames == 0) { w = fw; h = fh }
        val frameData = 3 * fw * fh
        var j = dataOff
        val end = dataOff + frameData
        require(end <= content.length, "truncated PPM frame")
        while (j < end) {
          val v = content(j) & 0xFF
          sum += v; hist(v >>> 4) += 1; j += 1
        }
        off = end
        frames += 1
      }
      (w, h, 0, frames, sum, hist)
    } else throw new IllegalArgumentException("unknown media container")
  }

  /** Parse one `P6\n<w> <h>\n255\n` header at `off`; returns (w, h,
    * payload offset). Whitespace-tolerant as the PPM spec allows. */
  private[ops] def ppmHeader(b: Array[Byte], off: Int): (Int, Int, Int) = {
    require(b(off) == 'P' && b(off + 1) == '6', "bad PPM magic")
    var i = off + 2
    def skipWs(): Unit = { while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t')) i += 1 }
    def int(): Int = {
      skipWs()
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val w = int(); val h = int(); val maxV = int()
    require(maxV == 255, s"unsupported PPM maxval $maxV")
    i += 1 // single whitespace after maxval per spec
    (w, h, i)
  }

  /** Batched feature extraction over a binary column. mapPartitions keeps
    * per-batch decoder state (a real decoder's buffers/handles) alive
    * across rows — the same execution shape as mapInPandas batches. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (w, h, sr, units, sum, hist) = decode(m.content)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
          w, h, sr, units, sum, hist)
      }
    }
  }

  /** Frame sampling over the video containers: one output row per sampled
    * frame (every `stride`-th), with REAL per-frame pixel statistics. The
    * video-path shape: one binary in, many frames out, flatMap. */
  def frameSample(media: Dataset[MediaRow], stride: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      if (m.content.length < 2 || m.content(0) != 'P' || m.content(1) != '6')
        Iterator.empty
      else {
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int, Long)]
        var off = 0
        var f = 0L
        while (off < m.content.length) {
          val (w, h, dataOff) = ppmHeader(m.content, off)
          val end = dataOff + 3 * w * h
          if (f % stride == 0) {
            var sum = 0L
            var j = dataOff
            while (j < end) { sum += (m.content(j) & 0xFF); j += 1 }
            frames += ((m.media_id, f, w, h, sum))
          }
          off = end
          f += 1
        }
        frames.iterator
      }
    }.toDF("media_id", "frame", "width", "height", "frame_sum")
  }

  /** Build the media table from the synthetic pages: media identity derives
    * from the page url (join-able back to pages); the payload is a valid
    * container synthesized per id. Embarrassingly parallel, no shuffle. */
  def mediaFromPages(pages: Dataset[graft.kg.Model.Page]): Dataset[MediaRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map { p =>
      val id = graft.kg.PagesSource.fnv64(p.url)
      // route the kind through mix64: FNV-1a's LOW bits are visibly biased
      // on this url family (measured 45/5/0 over the first 50 pages)
      val kind = (mix64(id) & 3) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "image"
      }
      MediaRow(id, kind, synthMedia(id, kind))
    }
  }
}
