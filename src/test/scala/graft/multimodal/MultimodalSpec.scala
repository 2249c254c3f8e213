package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Multimodal.MediaRow

class MultimodalSpec extends AnyFunSuite {
  private implicit val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def media(id: Long, n: Int, seed: Int): MediaRow =
    MediaRow(id, "image", Array.tabulate(n)(i => ((i * seed + seed) % 251).toByte))

  test("feature extraction: fixed dim, deterministic, partition-invariant") {
    val rows = Seq(media(1, 4096, 3), media(2, 1024, 7), media(3, 0, 1))
    val ds = rows.toDS()
    val a = Multimodal.extractFeatures(ds, dim = 32).collect()
      .sortBy(_.media_id)
    val b = Multimodal.extractFeatures(ds.repartition(3), dim = 32,
      targetPartitions = 2).collect().sortBy(_.media_id)
    assert(a.forall(_.features.length == 32))
    assert(a.map(_.n_bytes).toSeq == Seq(4096L, 1024L, 0L))
    // determinism across partitionings (a real decoder must hold this too)
    a.zip(b).foreach { case (x, y) =>
      assert(x.features.toSeq == y.features.toSeq)
    }
    assert(a(0).features.toSeq != a(1).features.toSeq)
    assert(a.forall(_.features.forall(f => f >= -1f && f <= 1f)))
  }

  test("frame sampling yields stride-spaced fixed-size frames") {
    val ds = Seq(media(9, 1000, 5)).toDS()
    val frames = Multimodal.sampleFrames(ds, frameSize = 100, stride = 2)
      .collect().sortBy(_.getInt(1))
    assert(frames.length == 5) // 1000 / (100*2)
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 100))
    val f0 = frames(0).getAs[Array[Byte]]("frame_bytes")
    val f1 = frames(1).getAs[Array[Byte]]("frame_bytes")
    assert(f0.toSeq != f1.toSeq)
  }

  test("extracted features feed the similarity operators end-to-end") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    // near-identical payloads -> near-identical feature vectors ->
    // top cosine neighbor; the multimodal features column is a normal
    // Array[Float] embedding as far as the similarity stack is concerned
    val base = Array.tabulate(2048)(i => (i % 97).toByte)
    val near = base.clone(); near(5) = 1.toByte
    val far  = Array.tabulate(2048)(i => ((i * 31 + 7) % 211).toByte)
    val feats = Multimodal.extractFeatures(
      Seq(MediaRow(1, "image", base), MediaRow(2, "image", near),
          MediaRow(3, "image", far)).toDS(), dim = 64).toDF()
    val a = feats.select(col("media_id").as("ida"), col("features").as("fa"))
    val b = feats.select(col("media_id").as("idb"), col("features").as("fb"))
    val sims = a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        Similarity.cosine(col("fa"), col("fb")).as("cs"))
      .orderBy(col("cs").desc).collect()
    assert((sims.head.getLong(0), sims.head.getLong(1)) == (1L, 2L))
  }

  test("decodeImageStats: real PNG decode matches independent ground truth") {
    // Expected values computed by a pure-Python PNG unfilter (zlib +
    // scanline filters, no image library) over the same committed
    // fixtures — an INDEPENDENT decoder, so this pins javax.imageio's
    // output, not itself.
    import org.apache.spark.sql.functions._
    val media = Multimodal.readBinaryDir(spark,
        "/root/repo/src/test/resources/media", "img_*.png")
      .select(regexp_extract(col("path"), "img_(\\d+)", 1).cast("long")
          .as("media_id"),
        lit("image").as("kind"), col("bytes"))
      .as[MediaRow]
    val got = Multimodal.decodeImageStats(media).collect()
      .sortBy(_.media_id)
      .map(s => (s.media_id, s.width, s.height, s.sum_r, s.sum_g, s.sum_b))
      .toSeq
    assert(got == Seq(
      (1L, 60L, 60L, 470552L, 342273L, 254230L),
      (2L, 120L, 120L, 1881902L, 1366511L, 1013826L),
      (3L, 300L, 300L, 11760559L, 8531560L, 6323593L)))
  }

  test("decodeImageStats quarantines undecodable payloads (no row, no crash)") {
    val rows = Seq(MediaRow(1, "image", Array[Byte](1, 2, 3)),
      MediaRow(2, "image", Array.emptyByteArray),
      MediaRow(3, "image", null))
    assert(Multimodal.decodeImageStats(rows.toDS()).collect().isEmpty)
  }

  /** Encode a synthetic RGB image as PNG bytes (row-major pixel fn). */
  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("resizeBoxStats is the exact integer box average") {
    // 2x2 image -> 1x1: output pixel = floor mean of the four pixels
    val rgb = Seq(0xff0000, 0x00ff00, 0x0000ff, 0x102030)
    val one = MediaRow(1, "image",
      pngBytes(2, 2)((x, y) => rgb(y * 2 + x)))
    val r = Multimodal.resizeBoxStats(Seq(one).toDS(), 1, 1).head()
    // means: r = (255+0+0+16)/4 = 67, g = (0+255+0+32)/4 = 71,
    //        b = (0+0+255+48)/4 = 75
    assert((r.sum_r, r.sum_g, r.sum_b) == ((67L, 71L, 75L)))
    assert((r.src_w, r.src_h, r.out_w, r.out_h) == ((2L, 2L, 1L, 1L)))
    // 4x2 -> 2x1: left box = cols 0-1, right box = cols 2-3, both rows
    val grad = MediaRow(2, "image",
      pngBytes(4, 2)((x, _) => (x * 60) << 16))
    val g = Multimodal.resizeBoxStats(Seq(grad).toDS(), 2, 1).head()
    // left r = (0+60+0+60)/4 = 30; right r = (120+180+120+180)/4 = 150
    assert(g.sum_r == 180L && g.sum_g == 0L && g.sum_b == 0L)
    // identity resize preserves the image: digest of raw RGB stream
    val idR = Multimodal.resizeBoxStats(Seq(one).toDS(), 2, 2).head()
    val raw = rgb.flatMap(p => Seq(((p >> 16) & 0xff).toByte,
      ((p >> 8) & 0xff).toByte, (p & 0xff).toByte)).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(raw).map(b => f"$b%02x").mkString
    assert(idR.digest == md)
    // corrupt payloads quarantine, decode contract shared
    assert(Multimodal.resizeBoxStats(
      Seq(MediaRow(9, "image", Array[Byte](1, 2, 3))).toDS(), 4, 4)
      .collect().isEmpty)
  }

  test("resizeBoxStats upscaling replicates pixels — no black stripes") {
    // 2x2 -> 5x5: the floor map ⌊x·5/2⌋ hits output cols {0, 2} only;
    // skipped cols/rows must replicate their left/up neighbor (the
    // nearest-neighbor convention), NEVER zero-fill. Expected grid:
    // col bucket for output ox: source 0 for ox<2(ish) replicated...
    // concretely: src col 0 lands at ox=0, src col 1 at ox=2; cols
    // 1 gets col 0's value, cols 3,4 get col 2's; same for rows.
    val rgb = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val one = MediaRow(1, "image",
      pngBytes(2, 2)((x, y) => rgb(y * 2 + x)))
    val r = Multimodal.resizeBoxStats(Seq(one).toDS(), 5, 5).head()
    // replication counts: src col 0 -> out cols {0,1} (2), src col 1
    // -> out cols {2,3,4} (3); same split for rows. Pixel multiplicity:
    // (0,0):2*2=4, (0,1):2*3=6, (1,0):3*2=6, (1,1):3*3=9 — total 25.
    // sums: r = 4*255 + 9*255 = 3315; g = 6*255 + 9*255 = 3825;
    //       b = 6*255 + 9*255 = 3825
    assert((r.sum_r, r.sum_g, r.sum_b) == ((3315L, 3825L, 3825L)))
    // 1x1 -> 3x3 is pure replication: every output pixel == the source
    val solid = MediaRow(2, "image", pngBytes(1, 1)((_, _) => 0x102030))
    val s = Multimodal.resizeBoxStats(Seq(solid).toDS(), 3, 3).head()
    assert((s.sum_r, s.sum_g, s.sum_b) == ((9 * 0x10L, 9 * 0x20L, 9 * 0x30L)))
  }

  test("phashLuma: spec on synthetic images + cross-scale stability") {
    // Synthetic pin of the aHash spec: a 16x16 image whose left half is
    // black and right half white. Cell mean > global mean exactly for
    // the right-half cells (columns 4..7 of the 8x8 grid), so the
    // signature is the 0xf0 column mask repeated on every row.
    val half = MediaRow(1, "image",
      pngBytes(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff))
    val sig = Multimodal.phashLuma(Seq(half).toDS()).head()
    val rowMask = 0xf0L
    val expected = (0 until 8).map(r => rowMask << (8 * r)).reduce(_ | _)
    assert(sig.phash == expected)
    // Cross-scale stability on REAL pixels: the three committed PNGs
    // are the same picture at 60/120/300 px — their real phashes must
    // agree within Hamming 2 pairwise (measured: 1/1/0). This is the
    // property that makes the hash a cross-resolution near-dup key.
    import org.apache.spark.sql.functions._
    val media = Multimodal.readBinaryDir(spark,
        "/root/repo/src/test/resources/media", "img_*.png")
      .select(regexp_extract(col("path"), "img_(\\d+)", 1).cast("long")
          .as("media_id"),
        lit("image").as("kind"), col("bytes"))
      .as[MediaRow]
    val sigs = Multimodal.phashLuma(media).collect().sortBy(_.media_id)
    assert(sigs.length == 3)
    for (Seq(a, b) <- sigs.toSeq.combinations(2))
      assert(java.lang.Long.bitCount(a.phash ^ b.phash) <= 2,
        s"phash drifted apart across scales: ${a.media_id} vs ${b.media_id}")
  }

  test("bandedHammingPairs equals brute-force popcount pairs") {
    // Handcrafted 64-bit signatures: b = a with 2 flipped bits (in the
    // SAME band), c = a with 2 flips in DIFFERENT bands, d = far from
    // everything, e == a exactly. Banding with 4 bands must find every
    // pair with hamming <= 2 — including cross-band flips (two flips
    // touch at most 2 of 4 bands, so 2 bands still match).
    val a = 0x0123456789abcdefL
    val sigs = Seq(
      (1L, a), (2L, a ^ 3L), (3L, a ^ (1L << 5) ^ (1L << 40)),
      (4L, ~a), (5L, a)).toDF("media_id", "phash")
    val got = Multimodal.bandedHammingPairs(sigs, "media_id", "phash",
        bits = 64, nBands = 4, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val vals = Map(1L -> a, 2L -> (a ^ 3L),
      3L -> (a ^ (1L << 5) ^ (1L << 40)), 4L -> ~a, 5L -> a)
    val brute = (for {
      x <- vals.keys; y <- vals.keys if x < y
      h = java.lang.Long.bitCount(vals(x) ^ vals(y)) if h <= 2
    } yield (x, y, h.toLong)).toSet
    assert(got == brute)
    assert(brute.contains((1L, 3L, 2L))) // the cross-band case is live
    // banding cannot promise completeness when bands <= maxHamming
    intercept[IllegalArgumentException] {
      Multimodal.bandedHammingPairs(sigs, "media_id", "phash", 64, 2, 2)
    }
  }

  test("binaryFile ingestion reads bytes + length") {
    val df = Multimodal.readBinaryDir(spark,
      "/root/repo/src/test/resources/fixtures/zip", "*.zip")
    val r = df.collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("length") > 0)
    assert(r(0).getAs[Array[Byte]]("bytes").take(2).toSeq ==
      Seq('P'.toByte, 'K'.toByte)) // zip magic
  }
}
