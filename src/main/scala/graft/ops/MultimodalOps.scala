package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in executor-side batches.
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment): [[fakeDecode]] derives deterministic pseudo-metadata and a
  * byte-histogram feature vector from the raw bytes. Everything around it —
  * schema, batched mapPartitions shape (the Scala analogue of a Pandas-batch
  * UDF), partition sizing, feature-vector output — is real, tested Spark
  * plumbing: swap [[fakeDecode]] for a real decoder and nothing else changes.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      width: Int, // stub-decoded dimensions
      height: Int,
      histogram: Array[Long]) // 16-bin byte histogram (the "features")

  /** STUB decode — deterministic stand-in for an image/audio decoder.
    * Real decoders plug in here (same signature: bytes → metadata+features). */
  def fakeDecode(content: Array[Byte]): (Int, Int, Array[Long]) = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < content.length) {
      hist((content(i) & 0xFF) >>> 4) += 1
      i += 1
    }
    val w = 16 + (if (content.length > 0) (content(0) & 0x7F) else 0)
    val h = 16 + (if (content.length > 1) (content(1) & 0x7F) else 0)
    (w, h, hist)
  }

  /** Batched feature extraction over a binary column. mapPartitions keeps the
    * per-batch decoder state (a real decoder's buffers/handles) alive across
    * rows — the same execution shape as mapInPandas batches. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        val (w, h, hist) = fakeDecode(m.content)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong, w, h, hist)
      }
    }
  }

  /** Deterministic frame-sample stub: pick every `stride`-th 256-byte window
    * as a "frame" (the video-path shape: one binary in, many frames out). */
  def frameSample(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val nFrames = math.max(m.content.length / 256, 1)
      (0 until nFrames by stride).iterator.map { f =>
        val from = f * 256
        val until = math.min(from + 256, m.content.length)
        val slice = java.util.Arrays.copyOfRange(m.content, from, math.max(until, from))
        val (w, h, hist) = fakeDecode(slice)
        (m.media_id, f, w, h, hist.sum)
      }
    }.toDF("media_id", "frame", "width", "height", "hist_mass")
  }

  /** Build a media table from the synthetic pages' html bytes (the opaque
    * binary stands in for image/audio payloads). */
  def mediaFromPages(pages: Dataset[graft.kg.Model.Page]): Dataset[MediaRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map { p =>
      val id = graft.kg.PagesSource.fnv64(p.url)
      val kind = (id & 3) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "image"
      }
      MediaRow(id, kind, p.html)
    }
  }
}
