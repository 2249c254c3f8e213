package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque BINARY columns with typed metadata, feature extraction as a
  * per-partition batch transform.
  *
  * IMAGE decode is REAL ([[decodeImageStats]], `javax.imageio` — in
  * the JDK, so no external codec needed). The EMBEDDING step stays a
  * deterministic fake (`fakeDecodeFeatures` derives a fixed-length
  * float vector from the bytes via md5-over-strides — an embedding
  * model doesn't fit this container). Everything around both
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

  final case class ImageStats(media_id: Long, width: Long, height: Long,
                              n_px: Long, sum_r: Long, sum_g: Long,
                              sum_b: Long, mean_r: Double, mean_g: Double,
                              mean_b: Double)

  /** REAL image decode — the one step [[fakeDecodeFeatures]] stubs.
    * `javax.imageio` ships with the JDK (PNG/JPEG/GIF/BMP), so no
    * external codec is needed: width, height, and exact per-channel
    * sums/means over the decoded sRGB pixels (alpha ignored;
    * non-premultiplied, as PNG stores it). Sums are exact longs, means
    * are one long→double division, so results are bit-reproducible by
    * any independent decoder of the same file — the q_mm_image_decode
    * oracle pins them against a pure-Python PNG unfilter of the same
    * committed fixtures.
    *
    * Undecodable or empty payloads yield NO row (flatMap), mirroring
    * how a production pipeline quarantines corrupt media rather than
    * failing the job. Decode is per-row CPU work with no shared codec
    * handle (`ImageIO.read` is stateless), so plain flatMap — not
    * mapPartitions — is the honest shape; pixel extraction goes one
    * SCANLINE at a time (bulk `getRGB` per row), never materializing a
    * full-frame int[] for large images.
    */
  def decodeImageStats(media: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[ImageStats] = {
    import spark.implicits._
    media.flatMap { m =>
      Option(m.bytes).filter(_.nonEmpty).flatMap { bs =>
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bs))).map { im =>
          val w = im.getWidth
          val h = im.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            im.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageStats(m.media_id, w.toLong, h.toLong, n, sr, sg, sb,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
  }

  final case class ResizedImage(media_id: Long, src_w: Long, src_h: Long,
    out_w: Long, out_h: Long, sum_r: Long, sum_g: Long, sum_b: Long,
    digest: String)

  /** Deterministic box-average RESIZE to `w`×`h` (the thumbnail /
    * model-input-normalization step): each output pixel is the
    * integer-floor mean of its source box (boxes partition the image
    * by `⌊i·W/w⌋` boundaries), so the result is bit-identical on any
    * JVM — unlike Graphics2D interpolation, whose rendering pipeline
    * is implementation-defined. Upscaling (w > W or h > H) is legal:
    * output columns/rows the floor map skips replicate their left
    * neighbor / previous scanline (the nearest-neighbor convention) —
    * never zero-fill. Returns the resized dims, per-channel
    * sums over the resized grid, and the md5 of the row-major RGB
    * byte stream (the artifact a downstream exact-dup check would
    * key on).
    *
    * Memory: one input scanline at a time + an `w×3` accumulator row —
    * O(W), never a full-frame buffer. Corrupt payloads drop (flatMap),
    * the [[decodeImageStats]] quarantine contract.
    */
  def resizeBoxStats(media: Dataset[MediaRow], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[ResizedImage] = {
    require(w > 0 && h > 0, s"target dims must be positive, got $w x $h")
    import spark.implicits._
    media.flatMap { m =>
      Option(m.bytes).filter(_.nonEmpty).flatMap { bs =>
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bs))).map { im =>
          val pw = im.getWidth; val ph = im.getHeight
          val out = new Array[Byte](w * h * 3)
          val row = new Array[Int](pw)
          val acc = Array.ofDim[Long](w, 3)
          val cnt = new Array[Long](w)
          var oy = 0
          var y = 0
          def flush(): Unit = {
            var ox = 0
            while (ox < w) {
              val base = (oy * w + ox) * 3
              if (cnt(ox) == 0L) {
                // upscaling: ⌊x·w/W⌋ skips output columns when w > W —
                // replicate the left neighbor (ox=0 always has sources,
                // x=0 maps there), the nearest-neighbor convention
                out(base) = out(base - 3)
                out(base + 1) = out(base - 2)
                out(base + 2) = out(base - 1)
              } else {
                val n = cnt(ox)
                out(base) = (acc(ox)(0) / n).toByte
                out(base + 1) = (acc(ox)(1) / n).toByte
                out(base + 2) = (acc(ox)(2) / n).toByte
              }
              acc(ox)(0) = 0; acc(ox)(1) = 0; acc(ox)(2) = 0; cnt(ox) = 0
              ox += 1
            }
          }
          // upscaling skips output ROWS the same way: replicate the
          // previous scanline into [from, untilRow)
          def fillRows(from: Int, untilRow: Int): Unit = {
            var r = from
            while (r < untilRow) {
              System.arraycopy(out, (r - 1) * w * 3, out, r * w * 3,
                w * 3)
              r += 1
            }
          }
          while (y < ph) {
            // output row this scanline belongs to: oy = ⌊y·h/H⌋
            val yBucket = (y.toLong * h / ph).toInt
            if (yBucket != oy) { flush(); fillRows(oy + 1, yBucket); oy = yBucket }
            im.getRGB(0, y, pw, 1, row, 0, pw)
            var x = 0
            while (x < pw) {
              val ox = (x.toLong * w / pw).toInt
              val p = row(x)
              acc(ox)(0) += (p >> 16) & 0xff
              acc(ox)(1) += (p >> 8) & 0xff
              acc(ox)(2) += p & 0xff
              cnt(ox) += 1
              x += 1
            }
            y += 1
          }
          flush()
          fillRows(oy + 1, h)
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < out.length) {
            sr += out(i) & 0xff; sg += out(i + 1) & 0xff
            sb += out(i + 2) & 0xff
            i += 3
          }
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(out).map(b => f"$b%02x").mkString
          ResizedImage(m.media_id, pw.toLong, ph.toLong, w.toLong,
            h.toLong, sr, sg, sb, digest)
        }
      }
    }
  }

  final case class PHashRow(media_id: Long, src_w: Long, src_h: Long,
                            phash: Long)

  /** Real-pixel perceptual hash (the aHash shape) over an `gw`×`gh`
    * luma grid: decode → partition the image into grid cells by the
    * same `⌊i·W/w⌋` box boundaries as [[resizeBoxStats]] → integer
    * Rec.709 luma sum per cell (2126·R + 7152·G + 722·B — the ×10⁴
    * fixed-point weights, exact integers) → bit `gy·gw+gx` set iff the
    * cell's mean luma exceeds the GLOBAL mean luma. The comparison is
    * exact integer cross-multiplication (cellSum·totalPx >
    * totalSum·cellPx via BigInt — no division, no floats, no overflow
    * at any image size), so the signature is bit-reproducible by any
    * independent decoder — the q_mm_phash_real oracle pins it against
    * a pure-Python PNG unfilter of the same committed fixtures.
    *
    * Why this survives rescaling: each cell aggregates a constant
    * FRACTION of the image, so the same picture at 60/120/300 px
    * yields near-identical bit patterns — the cross-resolution
    * near-dup property a thumbnail-dedup pipeline keys on
    * (MultimodalSpec asserts the three fixture scales agree within a
    * small Hamming radius). Cells the floor map leaves empty (only
    * when the image is smaller than the grid) contribute a 0 bit.
    * Same scanline-at-a-time memory discipline and corrupt-payload
    * quarantine (flatMap) as the other decoders.
    */
  def phashLuma(media: Dataset[MediaRow], gw: Int = 8, gh: Int = 8)(
      implicit spark: SparkSession): Dataset[PHashRow] = {
    require(gw > 0 && gh > 0 && gw * gh <= 64,
      s"grid must fit in 64 bits, got $gw x $gh")
    import spark.implicits._
    media.flatMap { m =>
      Option(m.bytes).filter(_.nonEmpty).flatMap { bs =>
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bs))).map { im =>
          val pw = im.getWidth; val ph = im.getHeight
          val sums = new Array[Long](gw * gh)
          val cnts = new Array[Long](gw * gh)
          val row = new Array[Int](pw)
          var y = 0
          while (y < ph) {
            im.getRGB(0, y, pw, 1, row, 0, pw)
            val gyBase = (y.toLong * gh / ph).toInt * gw
            var x = 0
            while (x < pw) {
              val p = row(x)
              val cell = gyBase + (x.toLong * gw / pw).toInt
              sums(cell) += 2126L * ((p >> 16) & 0xff) +
                7152L * ((p >> 8) & 0xff) + 722L * (p & 0xff)
              cnts(cell) += 1
              x += 1
            }
            y += 1
          }
          val totalSum = BigInt(sums.sum)
          val totalPx = BigInt(pw.toLong * ph)
          var bits = 0L
          var c = 0
          while (c < gw * gh) {
            if (cnts(c) > 0 &&
                BigInt(sums(c)) * totalPx > totalSum * cnts(c))
              bits |= 1L << c
            c += 1
          }
          PHashRow(m.media_id, pw.toLong, ph.toLong, bits)
        }
      }
    }
  }

  /** Banded-LSH near-dup pairs over fixed-width Hamming signatures
    * (the scale path for [[phashLuma]] outputs): split the `bits`-wide
    * signature into `nBands` contiguous bands, equi-join on (band,
    * value), verify candidates by exact popcount. Banding is COMPLETE
    * for `maxHamming` as long as `nBands > maxHamming` (h flips touch
    * at most h bands, so at least one band matches exactly) —
    * require()d, not assumed. Candidate volume is bucket-local like
    * every LSH join in this library; no all-pairs stage exists.
    * Output: (id_a, id_b, hamming), id_a < id_b, each pair once.
    */
  def bandedHammingPairs(sigs: DataFrame, idCol: String, sigCol: String,
                         bits: Int, nBands: Int,
                         maxHamming: Int): DataFrame = {
    require(nBands > maxHamming,
      s"banding is only complete for hamming <= ${nBands - 1} with " +
        s"$nBands bands (asked for $maxHamming)")
    require(bits % nBands == 0, s"$bits bits not divisible by $nBands")
    val w = bits / nBands
    val mask = if (w == 64) -1L else (1L << w) - 1
    val banded = sigs.select(col(idCol).as("__id"), col(sigCol).as("__sig"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col(sigCol), b * w).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bv")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv")
          && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("x.__sig").as("sig_a"),
        col("y.__id").as("id_b"), col("y.__sig").as("sig_b"))
      .distinct() // a pair close in several bands arrives once per band
    cand.withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
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
