package graft

import org.apache.spark.sql.functions._
import graft.functions.HashFns
import graft.multimodal.Multimodal

/** Oracle entry for the multimodal plumbing — the one extension group
  * that had no CORRECTNESS evidence in round 2 (spec-only). The query
  * runs the REAL pipeline end-to-end: binaryFile scan over a committed
  * fixture dir → typed MediaRow dataset → partition-batched
  * mapPartitions feature extraction → long-form (media_id, i, feature)
  * projection. The DuckDB oracle replays it over the same files via
  * read_blob: the fake decode is md5-over-byte-strides by construction
  * (Multimodal.fakeDecodeFeatures scaladoc), so the engine-side mirror
  * is hex slicing + HashFns.md5LongSql — nothing about the plumbing is
  * mocked except the codec itself.
  */
object QueriesMultimodal {

  private val fixtures = "/root/repo/src/test/resources/media"
  private val dim = 8

  val qs: Seq[Q] = Seq(
    Q("q_mm_features",
      (s, _) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = Multimodal.readBinaryDir(s, fixtures, "*.bin")
          .select(
            regexp_extract(col("path"), "media_(\\d+)", 1).cast("long")
              .as("media_id"),
            lit("image").as("kind"), col("bytes"))
          .as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media, dim = dim).toDF()
          .select(col("media_id"), col("n_bytes"),
            posexplode(col("features")).as(Seq("i", "feature")))
          .orderBy(col("media_id"), col("i"))
      },
      Some(s"""WITH src AS (
              |  SELECT CAST(regexp_extract(filename, 'media_(\\d+)', 1)
              |           AS BIGINT) AS media_id,
              |         size AS n_bytes, lower(hex(content)) AS h
              |  FROM read_blob('$fixtures/*.bin')),
              |strides AS (
              |  SELECT media_id, n_bytes, CAST(i AS INT) AS i,
              |    string_agg(substr(h, CAST(2 * (i + k * $dim) AS INT) + 1, 2),
              |      '' ORDER BY k) AS shex
              |  FROM src,
              |    unnest(range($dim)) t(i),
              |    unnest(range((n_bytes - i + ${dim - 1}) // $dim)) u(k)
              |  GROUP BY media_id, n_bytes, i)
              |SELECT media_id, n_bytes, i,
              |  CAST((${HashFns.md5LongSql("'s' || i || ':' || shex")}
              |    & 65535) / 32768.0 - 1.0 AS FLOAT) AS feature
              |FROM strides ORDER BY media_id, i""".stripMargin)),

    // Frame sampling over the same committed fixtures: every 4th
    // 16-byte block becomes a frame row — the (media_id, frame_no,
    // frame_bytes) explode shape a real video frame extractor emits.
    // The output pins each frame with its md5-derived fingerprint, so
    // the SLICING itself (offsets, lengths, frame count) is what the
    // DuckDB replay checks via blob-hex arithmetic.
    Q("q_mm_frame_sample",
      (s, _) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = Multimodal.readBinaryDir(s, fixtures, "*.bin")
          .select(
            regexp_extract(col("path"), "media_(\\d+)", 1).cast("long")
              .as("media_id"),
            lit("video").as("kind"), col("bytes"))
          .as[Multimodal.MediaRow]
        Multimodal.sampleFrames(media, frameSize = 16, stride = 4)
          .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
            length(col("frame_bytes")).cast("long").as("n_frame_bytes"),
            HashFns.md5Long(lower(hex(col("frame_bytes")))).as("frame_fp"))
          .orderBy(col("media_id"), col("frame_no"))
      },
      Some(s"""WITH src AS (
              |  SELECT CAST(regexp_extract(filename, 'media_(\\d+)', 1)
              |           AS BIGINT) AS media_id,
              |         size, lower(hex(content)) AS h
              |  FROM read_blob('$fixtures/*.bin')),
              |frames AS (
              |  SELECT media_id, CAST(f AS BIGINT) AS frame_no,
              |    substr(h, CAST(f * 64 * 2 AS INT) + 1, 32) AS fhex
              |  FROM src, unnest(range(size // 64)) t(f))
              |SELECT media_id, frame_no,
              |  CAST(16 AS BIGINT) AS n_frame_bytes,
              |  ${HashFns.md5LongSql("fhex")} AS frame_fp
              |FROM frames ORDER BY media_id, frame_no""".stripMargin)),

    // REAL image decode (javax.imageio) over the three committed PNG
    // fixtures — the reference's actual profile images
    // (DI-Connect-User/…profile-image-{small,medium,large}.png: 8-bit
    // RGBA, non-interlaced), renamed img_00{1,2,3}.png. The oracle is
    // an INDEPENDENT decode: a pure-Python PNG unfilter (zlib +
    // Paeth/Sub/Up/Average over scanlines, no image library) computed
    // the exact per-channel sums once; the literals below are that
    // ground truth. Width/height/sums are exact integers and each mean
    // is ONE long→double division performed identically by both
    // engines, so the compare is bit-exact with no stabilizer.
    Q("q_mm_image_decode",
      (s, _) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = Multimodal.readBinaryDir(s, fixtures, "img_*.png")
          .select(
            regexp_extract(col("path"), "img_(\\d+)", 1).cast("long")
              .as("media_id"),
            lit("image").as("kind"), col("bytes"))
          .as[Multimodal.MediaRow]
        Multimodal.decodeImageStats(media).toDF()
          .orderBy(col("media_id"))
      },
      Some("""WITH truth(media_id, width, height, n_px, sum_r, sum_g, sum_b) AS (
             |  VALUES (1, 60, 60, 3600, 470552, 342273, 254230),
             |         (2, 120, 120, 14400, 1881902, 1366511, 1013826),
             |         (3, 300, 300, 90000, 11760559, 8531560, 6323593))
             |SELECT CAST(media_id AS BIGINT) AS media_id,
             |  CAST(width AS BIGINT) AS width,
             |  CAST(height AS BIGINT) AS height,
             |  CAST(n_px AS BIGINT) AS n_px,
             |  CAST(sum_r AS BIGINT) AS sum_r,
             |  CAST(sum_g AS BIGINT) AS sum_g,
             |  CAST(sum_b AS BIGINT) AS sum_b,
             |  CAST(sum_r AS DOUBLE) / n_px AS mean_r,
             |  CAST(sum_g AS DOUBLE) / n_px AS mean_g,
             |  CAST(sum_b AS DOUBLE) / n_px AS mean_b
             |FROM truth ORDER BY media_id""".stripMargin)),

    // --------------------------------------- deterministic box resize
    // The model-input-normalization step over the same committed PNGs:
    // resizeBoxStats downsamples every image to 32x32 by integer-floor
    // box averaging — bit-identical on any JVM, unlike Graphics2D
    // interpolation, and O(scanline) memory. The three source sizes
    // (60/120/300 px) land within ~0.4% of each other's channel sums
    // after normalization — the property a thumbnail-dedup pipeline
    // relies on. Truth literals were computed once from the
    // deterministic spec (MultimodalSpec pins the math on synthetic
    // images; two independent runs reproduced the digests bit-exactly).
    Q("q_mm_resize",
      (s, _) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = Multimodal.readBinaryDir(s, fixtures, "img_*.png")
          .select(
            regexp_extract(col("path"), "img_(\\d+)", 1).cast("long")
              .as("media_id"),
            lit("image").as("kind"), col("bytes"))
          .as[Multimodal.MediaRow]
        Multimodal.resizeBoxStats(media, 32, 32).toDF()
          .orderBy(col("media_id"))
      },
      Some("""WITH truth(media_id, src_w, src_h, out_w, out_h,
             |           sum_r, sum_g, sum_b, digest) AS (
             |  VALUES
             |   (1, 60, 60, 32, 32, 133829, 96874, 71560,
             |    '98f992bacd5d3f9e4a27cbca0ee2b164'),
             |   (2, 120, 120, 32, 32, 133331, 96520, 71387,
             |    '5743568ab1b09cd3ed9615afd3d186b3'),
             |   (3, 300, 300, 32, 32, 133294, 96458, 71313,
             |    'e8d317a9728e66b0d43b04750d38499c'))
             |SELECT CAST(media_id AS BIGINT) AS media_id,
             |  CAST(src_w AS BIGINT) AS src_w,
             |  CAST(src_h AS BIGINT) AS src_h,
             |  CAST(out_w AS BIGINT) AS out_w,
             |  CAST(out_h AS BIGINT) AS out_h,
             |  CAST(sum_r AS BIGINT) AS sum_r,
             |  CAST(sum_g AS BIGINT) AS sum_g,
             |  CAST(sum_b AS BIGINT) AS sum_b, digest
             |FROM truth ORDER BY media_id""".stripMargin)),

    // Perceptual-hash near-dup over binary media: signature = sign bits
    // of the (fake-)decoded feature vector — the pHash shape, where a
    // real decoder slots in without touching anything downstream.
    // Spark side is the SCALE plan: 4 bands of 2 bits as the LSH
    // equi-join key (hamming <= 2 touches at most 2 of 4 bands, so at
    // least one band matches — banding is complete), hamming verify on
    // candidates only — never all pairs.
    // The DuckDB oracle brute-forces every pair from the same replayed
    // features, pinning the banded plan against exhaustive truth.
    Q("q_mm_phash_neardup",
      (s, _) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = Multimodal.readBinaryDir(s, fixtures, "*.bin")
          .select(
            regexp_extract(col("path"), "media_(\\d+)", 1).cast("long")
              .as("media_id"),
            lit("image").as("kind"), col("bytes"))
          .as[Multimodal.MediaRow]
        val sigs = Multimodal.extractFeatures(media, dim = dim).toDF()
          .select(col("media_id"), posexplode(col("features")))
          .groupBy(col("media_id"))
          .agg(sum(when(col("col") > 0f,
            expr("shiftleft(CAST(1 AS BIGINT), pos)"))
            .otherwise(0L)).as("sig"))
        // 4 bands of 2 bits over the 8-bit signature — the shared
        // banded-Hamming join (complete for hamming <= 2: 4 > 2)
        Multimodal.bandedHammingPairs(sigs, "media_id", "sig",
            bits = dim, nBands = 4, maxHamming = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH src AS (
              |  SELECT CAST(regexp_extract(filename, 'media_(\\d+)', 1)
              |           AS BIGINT) AS media_id,
              |         size AS n_bytes, lower(hex(content)) AS h
              |  FROM read_blob('$fixtures/*.bin')),
              |strides AS (
              |  SELECT media_id, CAST(i AS INT) AS i,
              |    string_agg(substr(h, CAST(2 * (i + k * $dim) AS INT) + 1, 2),
              |      '' ORDER BY k) AS shex
              |  FROM src,
              |    unnest(range($dim)) t(i),
              |    unnest(range((n_bytes - i + ${dim - 1}) // $dim)) u(k)
              |  GROUP BY media_id, n_bytes, i),
              |feats AS (
              |  SELECT media_id, i,
              |    CAST((${HashFns.md5LongSql("'s' || i || ':' || shex")}
              |      & 65535) / 32768.0 - 1.0 AS FLOAT) AS feature
              |  FROM strides),
              |sigs AS (
              |  SELECT media_id,
              |    CAST(sum(CASE WHEN feature > 0
              |      THEN 1 << i ELSE 0 END) AS BIGINT) AS sig
              |  FROM feats GROUP BY media_id)
              |SELECT a.media_id AS id_a, b.media_id AS id_b,
              |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
              |FROM sigs a JOIN sigs b ON a.media_id < b.media_id
              |WHERE bit_count(xor(a.sig, b.sig)) <= 2
              |ORDER BY id_a, id_b""".stripMargin)),

    // ------------------------- perceptual hash over REAL pixels
    // The gap q_mm_phash_neardup leaves open (its signature rides the
    // fake feature vector): Multimodal.phashLuma decodes the three
    // committed PNGs for real (javax.imageio — the q_mm_image_decode
    // chain) and computes the 8x8 luma-grid aHash — integer Rec.709
    // cell sums, bit set iff cell mean > global mean by exact
    // cross-multiplication. The oracle literals are an INDEPENDENT
    // pure-Python PNG unfilter + identical integer spec
    // (tools/phash_truth.py) run once over the same fixtures. The
    // three images are the SAME picture at 60/120/300 px; their real
    // phashes land within Hamming 1 of each other (pairwise 1/1/0) —
    // the cross-resolution near-dup property a thumbnail-dedup
    // pipeline keys on, now demonstrated on real pixels end to end
    // (MultimodalSpec pins the pairwise radius).
    Q("q_mm_phash_real",
      (s, _) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = Multimodal.readBinaryDir(s, fixtures, "img_*.png")
          .select(
            regexp_extract(col("path"), "img_(\\d+)", 1).cast("long")
              .as("media_id"),
            lit("image").as("kind"), col("bytes"))
          .as[Multimodal.MediaRow]
        Multimodal.phashLuma(media, gw = 8, gh = 8).toDF()
          .orderBy(col("media_id"))
      },
      Some("""WITH truth(media_id, src_w, src_h, phash) AS (
             |  VALUES (1, 60, 60, 542614352456580351),
             |         (2, 120, 120, 542614352455531775),
             |         (3, 300, 300, 542614352455531775))
             |SELECT CAST(media_id AS BIGINT) AS media_id,
             |  CAST(src_w AS BIGINT) AS src_w,
             |  CAST(src_h AS BIGINT) AS src_h,
             |  CAST(phash AS BIGINT) AS phash
             |FROM truth ORDER BY media_id""".stripMargin))
  )
}
