package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque BINARY columns with typed metadata, feature extraction as a
  * per-partition batch transform.
  *
  * The decode step is a DETERMINISTIC FAKE (this container has no
  * image/audio codecs): `fakeDecodeFeatures` derives a fixed-length
  * float vector from the bytes via a rolling hash. Everything around it
  * is the real plumbing — schema contract, binaryFile ingestion,
  * partition-batched execution (`mapPartitions`, the JVM analogue of
  * `mapInPandas`: one buffer per PARTITION, not per row, so a real
  * decoder would amortize model/codec init exactly the same way), and
  * size-aware repartitioning so one 4K video and a thousand thumbnails
  * don't land on the same task.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),          // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))))))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, features: Array[Float])

  /** Ingest a directory of raw files as (path, bytes) via the binaryFile
    * source — the scan-side of S10's "many archives" alternative.
    */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"), col("content").as("bytes"))

  /** Deterministic stand-in for image/audio decode + embed: feature i is
    * an md5-derived hash of the i-th byte STRIDE (bytes i, i+dim,
    * i+2·dim, … as lowercase hex), scaled to [-1, 1]. Byte-local like a
    * real content embedding (flipping one byte changes one stride →
    * one feature), stable across JVMs/partitionings, and — the reason
    * for md5 over the previous FNV — reproducible by ANY engine:
    * the derivation is exactly `HashFns.md5Long("s<i>:<strideHex>")`,
    * whose DuckDB mirror backs the q_mm_features oracle. Replace with a
    * real decoder at the same call site.
    */
  def fakeDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.isEmpty) return out
    val hex = {
      val sb = new java.lang.StringBuilder(bytes.length * 2)
      bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < dim) {
      val sb = new java.lang.StringBuilder("s").append(i).append(':')
      var j = i
      while (j < bytes.length) {
        sb.append(hex, 2 * j, 2 * j + 2)
        j += dim
      }
      val digest = md.digest(sb.toString.getBytes("UTF-8")) // resets md
      val digestHex = digest.take(8).map(b => f"${b & 0xff}%02x").mkString
      val h = java.lang.Long.parseLong(digestHex.substring(0, 15), 16)
      out(i) = ((h & 0xffffL).toFloat / 32768f) - 1f
      i += 1
    }
    out
  }

  /** Partition-batched feature extraction. `targetPartitions` spreads the
    * (skew-prone) media bytes before the heavy step — at cluster scale
    * pass ~2-3x the executor-core count.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
                      targetPartitions: Int = 0)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val spread = if (targetPartitions > 0)
      media.repartition(targetPartitions, col("media_id")) else media
    spread.mapPartitions { rows =>
      // per-partition init happens HERE once (codec/model handle in the
      // real implementation), then streams the batch through it
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind,
          if (m.bytes == null) 0L else m.bytes.length.toLong,
          fakeDecodeFeatures(m.bytes, dim))
      }
    }
  }

  /** Frame sampling for video-like payloads: every `stride`-th fixed-size
    * block becomes one frame row — the explode shape (media_id, frame_no,
    * frame_bytes) a real frame extractor would produce.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int,
                   stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.flatMap { m =>
      val bs = Option(m.bytes).getOrElse(Array.emptyByteArray)
      val nFrames = bs.length / (frameSize * stride)
      (0 until nFrames).map { f =>
        val start = f * frameSize * stride
        (m.media_id, f, bs.slice(start, start + frameSize))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
