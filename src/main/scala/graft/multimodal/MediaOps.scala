package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in batched
  * per-partition passes — the Scala analog of the mapInPandas pattern
  * (arrow batches → vectorized decode).
  *
  * The actual media decode is STUBBED (this container ships no
  * image/audio codecs): `FakeCodec` derives deterministic
  * dimensions/frames/features from the bytes' md5, so every schema,
  * partitioning, and batch-shape decision is real and tested while the
  * codec call sites are single, clearly-marked functions to swap for
  * javacv/ffmpeg bindings in production.
  *
  * Scale notes: decode is the CPU hot spot, so [[decodeImages]]
  * repartitions by media_id to spread work across executors regardless
  * of upstream file layout, and processing runs per-partition
  * (mapPartitions — one codec init per task, not per row, exactly like
  * a pandas-UDF batch).
  */
object MediaOps {

  /** Opaque media row: content is the raw bytes, meta carries typed
    * sidecar fields (mime, source). */
  case class MediaFile(media_id: Long, kind: String, content: Array[Byte],
                       mime: String, source: String)

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           channels: Int, embedding: Array[Float])

  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** ======== STUB CODEC ========
    * Deterministic fake standing in for a real decoder; replace these
    * three functions (only) with real bindings. */
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
        when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
        col("text").cast("binary").as("content"),
        lit("application/octet-stream").as("mime"),
        col("source"))
      .as[MediaFile]
  }

  /** Batched image decode + feature extraction. One codec per partition,
    * rows processed as an iterator (never materialized per-task). */
  def decodeImages(media: Dataset[MediaFile], parallelism: Int): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .repartition(parallelism, col("media_id"))
      .mapPartitions { batch =>
        // real impl: initialize the codec ONCE here, then stream the batch
        batch.map { m =>
          val (w, h, c) = FakeCodec.imageDims(m.content)
          ImageFeatures(m.media_id, w, h, c, FakeCodec.features(m.content))
        }
      }
  }

  /** Resize: metadata transform + (stubbed) byte transform, preserving
    * the opaque-binary shape so downstream stages are codec-agnostic. */
  def resizeImages(media: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind != "image") m
      else m.copy(content = m.content, // real impl: re-encoded pixels
        mime = s"${m.mime}; resized=${w}x$h")
    }
  }

  /** Frame sampling: one row per kept frame (flatMap = the generator
    * shape; output cardinality is data-dependent, never collected). */
  def sampleFrames(media: Dataset[MediaFile], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = FakeCodec.frameCount(m.content)
      (0 until n by everyN).map { i =>
        // real impl: seek+decode frame i
        Frame(m.media_id, i, MessageDigest.getInstance("MD5")
          .digest(m.content ++ Array(i.toByte)))
      }
    }
  }

  /** Feature table ready for the ANN path: media embeddings in the same
    * (id, embedding) shape as the embeddings table, so
    * `operators.AnnSearch` applies unchanged. */
  def toEmbeddingTable(feats: Dataset[ImageFeatures]): DataFrame =
    feats.toDF().select(col("media_id").as("vec_id"), col("embedding"))
}
