package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{Bins, Headers, TimeFns}
import graft.operators.{Dedup, Salt, Sessionize}

/** ScalaCheck laws (run natively by sbt's ScalaCheck framework).
  * Column-level laws evaluate whole generated batches through one Spark
  * job per property to keep runtime sane.
  */
object Laws extends Properties("graft") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // F10 ∘ F9 = id on [0, 100h): seconds -> "H:MM:SS" -> seconds
  property("secondsToHms/hmsToSeconds round-trip") =
    Prop.forAll(Gen.listOfN(50, Gen.choose(0L, 360000L))) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("s").select(col("s"),
          TimeFns.hmsToSeconds(TimeFns.secondsToHms(col("s"))).as("rt"))
        df.filter(col("s") =!= col("rt")).count() == 0
      }
    }

  // binLabel and binId are consistent and total on [0, inf)
  property("bin label/id consistency") =
    Prop.forAll(Gen.listOfN(50, Gen.choose(0.0, 50.0))) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("v").select(
          Bins.binLabel(col("v"), Bins.distanceBins).as("label"),
          Bins.binId(col("v"), Bins.distanceBins).as("id"))
        val pairs = df.collect().map(r => (r.getString(0), r.getInt(1)))
        pairs.forall { case (l, i) =>
          Bins.distanceBins.exists(b => b.label == l && b.id == i)
        }
      }
    }

  // keepFirst is idempotent for any keyed data
  property("dedup idempotence") =
    Prop.forAll(Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 1000)))) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("k", "seq")
        val once  = Dedup.keepFirst(df, Seq("k"), Seq(col("seq")))
        val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("seq")))
        once.orderBy("k", "seq").collect().toSeq ==
          twice.orderBy("k", "seq").collect().toSeq
      }
    }

  // the min_by aggregate form and the row_number window form of
  // keep-first agree on ANY total-ordered log (the skew-safe swap is
  // answer-preserving by law, not just on the oracle corpus)
  property("keepFirstAgg == keepFirst for any total-ordered log") =
    Prop.forAll(Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 1000)))) { xs =>
      xs.isEmpty || {
        val rows = xs.zipWithIndex.map { case ((k, v), i) => (k, i, v) }
        val df = rows.toDF("k", "seq", "v")
        Dedup.keepFirstAgg(df, Seq("k"), Seq(col("seq")))
          .orderBy("k").collect().toSeq ==
          Dedup.keepFirst(df, Seq("k"), Seq(col("seq")))
            .orderBy("k").collect().toSeq
      }
    }

  // SCD2's open rows ARE keep-latest: history compaction never loses
  // or changes the final state of any key (keep-latest dedup is the
  // one-interval special case of Scd2)
  property("scd2 current rows == keepLatest state") =
    Prop.forAll(Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 3)))) { xs =>
      xs.isEmpty || {
        val rows = xs.zipWithIndex.map { case ((k, s), i) => (k, i, s"s$s") }
        val df = rows.toDF("k", "t", "state")
        val current = graft.operators.Scd2
          .fromChangeLog(df, Seq("k"), Seq("state"), "t")
          .filter(col("is_current")).select("k", "state")
        val latest = Dedup.keepLatest(df, Seq("k"), col("t"))
          .select("k", "state")
        current.orderBy("k", "state").collect().toSeq ==
          latest.orderBy("k", "state").collect().toSeq
      }
    }

  // salted aggregation is value-identical to the direct group-by for
  // any keyed data and any salt source
  property("salted agg == direct agg") =
    Prop.forAll(Gen.listOfN(60, Gen.zip(
      Gen.choose(0, 3), Gen.choose(0, 10000), Gen.choose(0, 1 << 20)))) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("k", "cents", "saltsrc")
          .withColumn("v", (col("cents") / 100.0).cast("decimal(18,2)"))
        val direct = df.groupBy("k")
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .orderBy("k").collect().toSeq
        val salted = Salt.aggregate(df, Seq(col("k")),
            Salt.saltFrom(col("saltsrc"), 8),
            Seq("s" -> (col("v"), Salt.sum2), "n" -> (lit(1L), Salt.sum2)))
          .orderBy("k").collect().toSeq
        salted == direct
      }
    }

  // sessionization: per user, #sessions == 1 + #gaps exceeding the
  // threshold in time order (the lag-gap/cumulative-flag invariant)
  property("sessionize gap law") =
    Prop.forAll(
      Gen.choose(1L, 600L),
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 100000L)))) {
      (gap, xs) =>
      xs.isEmpty || {
        val rows = xs.zipWithIndex.map { case ((u, off), i) =>
          (u.toLong, new java.sql.Timestamp(off * 1000L), i.toLong)
        }
        val df = rows.toDF("user", "ts", "eid")
        val out = Sessionize.sessionize(df, col("user"), col("ts"),
            Seq(col("ts"), col("eid")), gapSeconds = gap)
          .groupBy("user")
          .agg(max(col("session_id")).as("n_sessions"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val expected = rows.groupBy(_._1).map { case (u, rs) =>
          val ts = rs.map(r => (r._2.getTime, r._3)).sorted.map(_._1)
          u -> (1L + ts.sliding(2).count {
            case Seq(a, b) => b - a > gap * 1000L
            case _ => false
          })
        }
        out == expected
      }
    }

  // header normalization is idempotent and emits only [A-Za-z0-9_]
  property("header normalize idempotent + clean") =
    Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { names =>
      names.forall { n =>
        val once = Headers.normalizeName(n)
        Headers.normalizeName(once) == once &&
          once.forall(ch => ch.isLetterOrDigit && ch < 128 || ch == '_')
      }
    }

  // Correlation.matrix's scaled-integer (hi/lo split long) co-moments
  // equal an independent exact BigDecimal computation of Pearson r, to
  // the operator's stated 12-decimal stabilization, on random 2-decimal
  // data including negatives and constant columns (NaN diagonal guard).
  property("corr matrix == exact BigDecimal reference") =
    Prop.forAll(Gen.listOfN(40, Gen.zip(
      Gen.choose(-99999, 99999), Gen.choose(-99999, 99999)))) { xs =>
      xs.isEmpty || {
        val df = xs.map { case (a, b) => (a / 100.0, b / 100.0) }
          .toDF("x", "y")
        val got = graft.operators.Correlation.matrix(df, Seq("x", "y"))
          .filter(col("col_a") === "x" && col("col_b") === "y")
          .collect()(0).getDouble(2)
        // reference: exact integer co-moments via BigInt, closing
        // arithmetic in double with the same 12-decimal rounding
        val sx  = xs.map(v => BigInt(v._1)).sum
        val sy  = xs.map(v => BigInt(v._2)).sum
        val sxy = xs.map(v => BigInt(v._1) * BigInt(v._2)).sum
        val sxx = xs.map(v => BigInt(v._1) * BigInt(v._1)).sum
        val syy = xs.map(v => BigInt(v._2) * BigInt(v._2)).sum
        val n = xs.size.toDouble
        def d(b: BigInt) = BigDecimal(b).toDouble
        val cov  = n * d(sxy) - d(sx) * d(sy)
        val varx = n * d(sxx) - d(sx) * d(sx)
        val vary = n * d(syy) - d(sy) * d(sy)
        val raw = cov / math.sqrt(varx * vary)
        // Stabilize.stab's exact arithmetic: bround(x*1e12)/1e12, which
        // on doubles is rint off representation ties
        val expected = math.rint(raw * 1e12) / 1e12
        (raw.isNaN && got.isNaN) || got == expected
      }
    }

  // groupedExactByHistogram equals the built-in grouped percentile
  // bit-for-bit for ANY keyed values (ties, negatives, nulls arrive
  // via the toy spec; here the law covers arbitrary group shapes,
  // including groups of size 1 and heavily tied groups).
  property("grouped histogram percentile == built-in percentile") =
    Prop.forAll(
      Gen.listOfN(60, Gen.zip(Gen.choose(0, 4), Gen.choose(-50, 50))),
      Gen.choose(0.0, 1.0)) { (xs, p) =>
      xs.isEmpty || {
        val df = xs.map { case (g, v) => (s"g$g", v / 4.0) }.toDF("g", "v")
        val got = graft.operators.Percentiles
          .groupedExactByHistogram(df, Seq("g"), "v", Seq(p -> "q"))
          .orderBy("g").collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        val want = df.groupBy(col("g"))
          .agg(expr(s"percentile(v, $p)").as("q"), count(col("v")).as("n"))
          .orderBy("g").collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        got.toSeq == want.toSeq
      }
    }

  // SpanDedup.coverage equals a brute-force reference on arbitrary
  // token streams: a token is covered iff some n-gram window through it
  // occurs in >= 2 documents. Small alphabet forces heavy span overlap.
  property("span-dedup coverage == brute-force reference") =
    Prop.forAll(Gen.listOfN(3,
      Gen.listOfN(14, Gen.oneOf("a", "b", "c")))) { docs =>
      val n = 4
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks) }.toDF("doc_id", "toks")
      val got = graft.operators.SpanDedup.coverage(df, "doc_id", "toks", n)
        .collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).longValue)
          -> r.getBoolean(3)).toMap
      // reference: exact string n-grams, cross-doc duplicate detection,
      // positional coverage — all in plain Scala
      val grams = docs.zipWithIndex.flatMap { case (toks, i) =>
        toks.sliding(n).filter(_.size == n).zipWithIndex
          .map { case (g, s) => (i.toLong, s.toLong, g.mkString(" ")) }
      }
      val dupGrams = grams.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size > 1).keySet
      val dupStarts = grams.filter(g => dupGrams(g._3))
        .map(g => (g._1, g._2)).toSet
      val want = docs.zipWithIndex.flatMap { case (toks, i) =>
        toks.indices.map { pIdx =>
          val p = pIdx.toLong
          val covered = ((p - n + 1) to p)
            .exists(st => st >= 0 && dupStarts((i.toLong, st)))
          (i.toLong, p) -> covered
        }
      }.toMap
      got == want
    }

  // Intervals.mergeIslands == brute-force sweep: islands are maximal
  // disjoint unions (strict gaps between islands), cover every input
  // interval, and preserve the interval count. Small key/coordinate
  // domains force heavy overlap, containment, and abutment cases.
  property("interval merge == brute-force union sweep") =
    Prop.forAll(Gen.listOfN(40, Gen.zip(Gen.choose(0, 2),
      Gen.choose(0L, 60L), Gen.choose(0L, 25L)))) { xs =>
      xs.isEmpty || {
        val rows = xs.zipWithIndex.map { case ((k, s, len), i) =>
          (k, i.toLong, s, s + len) }
        val df = rows.toDF("k", "id", "s", "e")
        val got = graft.operators.Intervals.mergeIslands(df,
            Seq(col("k")), col("s"), col("e"),
            Seq(col("s"), col("e"), col("id")))
          .orderBy("k", "island_id").collect()
          .map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
            r.getLong(4)))
        // reference: per key, sort by start and sweep a running max
        val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
          val sorted = rs.map(r => (r._3, r._4)).sorted
          val islands = sorted.tail.foldLeft(
            Vector((sorted.head._1, sorted.head._2, 1L))) {
            case (acc, (s, e)) =>
              val (is, ie, n) = acc.last
              if (s > ie) acc :+ ((s, e, 1L))
              else acc.init :+ ((is, math.max(ie, e), n + 1))
          }
          islands.map { case (s, e, n) => (k, s, e, n) }
        }.sorted
        got.toSeq.map(r => (r._1, r._2, r._3, r._4)).sorted == want
      }
    }

  // Concentration.gini == the O(n²) mean-absolute-difference form
  // G = Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx) on any nonnegative integer sample (the
  // histogram rank fold is an algebraic rewrite of exactly this).
  property("gini == brute-force mean absolute difference") =
    Prop.forAll(Gen.listOfN(30, Gen.choose(0L, 40L))) { xs =>
      xs.sum == 0 || {
        val df = xs.toDF("v")
        val got = graft.operators.Concentration.gini(df, col("v"))
          .collect().head
        val n = xs.size.toDouble
        val s = xs.sum.toDouble
        val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
        val want = mad / (2 * n * s)
        got.getLong(0) == xs.size &&
          math.abs(got.getDouble(2) - want) < 1e-5
      }
    }

  // Drift.mannWhitney == brute-force pair counting: U_ref counts
  // cross pairs the reference value wins plus half the ties. Narrow
  // value domain forces heavy tie handling through the histogram path.
  property("mann-whitney U == brute-force pair counts") =
    Prop.forAll(Gen.zip(
      Gen.listOfN(25, Gen.choose(0L, 8L)),
      Gen.listOfN(25, Gen.choose(0L, 8L)))) { case (as, bs) =>
      as.isEmpty || bs.isEmpty || {
        val ra = as.toDF("v")
        val cb = bs.toDF("v")
        val got = graft.operators.Drift.mannWhitney(ra, cb, "v")
          .collect().head
        val wins = (for (a <- as; b <- bs) yield
          if (a > b) 2L else if (a == b) 1L else 0L).sum
        got.getLong(0) == as.size && got.getLong(1) == bs.size &&
          got.getDouble(2) == wins / 2.0 &&
          got.getDouble(3) == (2L * as.size * bs.size - wins) / 2.0
      }
    }

  // KCore.boundedPeel == brute-force fixed-round peeling on arbitrary
  // small undirected graphs (dense node domain forces real peeling
  // cascades: nodes surviving round 1 die in round 2 when their
  // neighbors dropped).
  property("bounded k-core peel == brute-force rounds") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(Gen.choose(0, 9),
      Gen.choose(0, 9)))) { raw =>
      val und0 = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      und0.isEmpty || {
        val k = 2; val rounds = 3
        val df = und0.toDF("u", "v")
        val got = graft.operators.KCore.boundedPeel(df, k, rounds)
          .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
        var e = und0
        for (_ <- 1 to rounds) {
          val deg = (e.map(_._1) ++ e.map(_._2))
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
          val keep = deg.filter(_._2 >= k).keySet
          e = e.filter(p => keep(p._1) && keep(p._2))
        }
        val want = (e.map(_._1) ++ e.map(_._2))
          .groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.sorted
        got.toSeq == want
      }
    }

  // Bootstrap.replicateMean == a plain-Scala replay of the same
  // hash-derived Poisson weights: determinism and the scaled-long
  // arithmetic are both pinned (the per-unit md5, the per-replica
  // affine mix, the integer CDF ladder, the 10^scale long scaling,
  // and the two-step double mean must all agree with an independent
  // implementation).
  property("poisson bootstrap replicates == scala replay") =
    Prop.forAll(Gen.listOfN(20, Gen.choose(1, 500))) { xs =>
      xs.isEmpty || {
        val b = 5
        val rows = xs.zipWithIndex.map { case (v, i) =>
          (i.toLong, BigDecimal(v)) }
        val df = rows.toDF("id", "v")
        val got = graft.operators.Bootstrap.replicateMean(df, col("id"),
            col("v"), b, "law")
          .collect().map(r => (r.getLong(0), r.getLong(2),
            r.getDouble(3))).sortBy(_._1)
        def md5Long(s: String): Long = {
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))
            .map(x => f"$x%02x").mkString.take(15)
          java.lang.Long.parseLong(hex, 16)
        }
        val (alos, ahis, cs) = graft.operators.Bootstrap.mixConstants(b)
        val thresholds = graft.operators.Bootstrap.poisson1CdfT
        val mask30 = (1L << 30) - 1
        val want = (0 until b).map { rep =>
          val wts = rows.map { case (id, _) =>
            val h = md5Long(s"law:$id")
            val hLo = h & mask30
            val hHi = h >> 30
            val cross = (hLo * ahis(rep) + hHi * alos(rep)) & mask30
            val m = (hLo * alos(rep) + (cross << 30) +
              cs(rep)) % (1L << 60)
            val k = thresholds.indexWhere(m < _)
            id -> (if (k == -1) thresholds.size.toLong else k.toLong)
          }
          val nEff = wts.map(_._2).sum
          val wsScaled = rows.zip(wts).map { case ((_, v), (_, w)) =>
            (v * 1000000L).toLongExact * w }.sum
          val wSum = wsScaled.toDouble / 1000000.0
          (rep.toLong, nEff, wSum / nEff.toDouble)
        }
        got.toSeq == want
      }
    }

  // Survival.kaplanMeier == the textbook product-limit computation on
  // arbitrary censored samples (narrow duration domain forces ties
  // between observed events and censorings at the same time).
  property("kaplan-meier == brute-force product-limit") =
    Prop.forAll(Gen.listOfN(30, Gen.zip(Gen.choose(0L, 6L),
      Gen.oneOf(0L, 1L)))) { xs =>
      xs.isEmpty || {
        val df = xs.toDF("dur", "ev")
        val got = graft.operators.Survival.kaplanMeier(df, "dur", "ev")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3)))
        val eventTimes = xs.filter(_._2 == 1L).map(_._1).distinct.sorted
        var surv = 1.0
        val want = eventTimes.map { t =>
          val nRisk = xs.count(_._1 >= t).toLong
          val d = xs.count(x => x._1 == t && x._2 == 1L).toLong
          surv *= 1.0 - d.toDouble / nRisk.toDouble
          (t, nRisk, d, surv)
        }
        got.length == want.length &&
          got.zip(want).forall { case ((t1, n1, d1, s1), (t2, n2, d2, s2)) =>
            t1 == t2 && n1 == n2 && d1 == d2 && math.abs(s1 - s2) < 1e-5
          }
      }
    }

  // Eval.mapMrrAtK == a brute-force AP/MRR replay on random rankings
  // (scores collide on purpose: ties resolve by the id tiebreaker)
  property("MAP/MRR == brute-force replay") =
    Prop.forAll(Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 20L),
        Gen.prob(0.4)))) { raw =>
      raw.isEmpty || {
        val rows = raw.zipWithIndex.map { case ((g, s, r), i) =>
          (s"g$g", i.toLong, s, r) }
        val k = 5
        val got = Eval2.mapMrr(rows, k)
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          val ranked = rs.sortBy(r => (-r._3, r._2))
          var cum = 0L
          val terms = ranked.zipWithIndex.map { case (r, i0) =>
            if (r._4) cum += 1
            if (r._4 && i0 + 1 <= k)
              BigDecimal(math.rint(cum.toDouble / (i0 + 1) * 1e9) / 1e9)
                .setScale(12, BigDecimal.RoundingMode.HALF_UP)
            else BigDecimal(0)
          }
          val nRel = rs.count(_._4).toLong
          val first = ranked.zipWithIndex
            .collectFirst { case (r, i0) if r._4 => (i0 + 1).toLong }
          val ap = if (nRel > 0)
            Some(terms.sum.toDouble / math.min(nRel, k).toDouble)
          else None
          g -> (rs.size.toLong, nRel, first,
            first.map(1.0 / _), ap)
        }
        got == want
      }
    }

  private object Eval2 {
    def mapMrr(rows: Seq[(String, Long, Long, Boolean)], k: Int) = {
      graft.operators.Eval.mapMrrAtK(
          rows.toDF("q", "id", "s", "rel"), "q", "s", "rel", "id", k)
        .collect().map { r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2),
            Option(r.getAs[Any]("first_rel_rank"))
              .map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("mrr")).map(_.asInstanceOf[Double]),
            Option(r.getAs[Any]("ap")).map(_.asInstanceOf[Double]))
        }.toMap
    }
  }

  // Encoding.targetEncode == the common-denominator formula and the
  // exact leave-one-out means on random categorized data
  property("target encoding == brute-force smoothing and LOO") =
    Prop.forAll(Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 5), Gen.choose(1, 1000)))) { raw =>
      raw.isEmpty || {
        val rows = raw.zipWithIndex.map { case ((c, v), i) =>
          (i.toLong, s"c$c", v) }
        val m = 7L
        val df = rows.toDF("id", "cat", "y")
          .withColumn("y", col("y").cast("decimal(18,2)"))
        val got = graft.operators.Encoding
          .targetEncode(df, "cat", col("y"), m)
          .collect().map(r => r.getAs[Long]("id") ->
            (r.getAs[Long]("n_cat"), r.getAs[Double]("enc_smooth"),
              Option(r.getAs[Any]("enc_loo"))
                .map(_.asInstanceOf[Double]))).toMap
        val bigN = rows.size.toLong
        val s = rows.map(_._3.toLong).sum
        val byCat = rows.groupBy(_._2)
        rows.forall { case (id, c, v) =>
          val cs = byCat(c)
          val nc = cs.size.toLong
          val sc = cs.map(_._3.toLong).sum
          val smooth = (sc * bigN + m * s).toDouble /
            ((nc + m) * bigN).toDouble
          val loo = if (nc > 1)
            Some((sc - v).toDouble / (nc - 1).toDouble) else None
          got(id) == ((nc, smooth, loo))
        }
      }
    }

  // Geo.haversineKm == a plain-Scala replay of the same formula tree
  property("haversine == scala replay") =
    Prop.forAll(Gen.listOfN(20, Gen.zip(
      Gen.choose(-89.9, 89.9), Gen.choose(-179.9, 179.9),
      Gen.choose(-89.9, 89.9), Gen.choose(-179.9, 179.9)))) { pts =>
      pts.isEmpty || {
        val got = pts.toDF("a", "b", "c", "d")
          .select(graft.functions.Geo.haversineKm(col("a"), col("b"),
            col("c"), col("d")).as("km"))
          .collect().map(_.getDouble(0)).toSeq
        def rad(x: Double) = math.toRadians(x)
        val want = pts.map { case (la1, lo1, la2, lo2) =>
          val dphi = rad(la2 - la1) / 2
          val dlam = rad(lo2 - lo1) / 2
          val h = math.sin(dphi) * math.sin(dphi) +
            math.cos(rad(la1)) * math.cos(rad(la2)) *
              math.sin(dlam) * math.sin(dlam)
          2 * graft.functions.Geo.earthRadiusKm *
            math.asin(math.min(1.0, math.sqrt(h)))
        }
        got.zip(want).forall { case (g, w) =>
          math.abs(g - w) <= 1e-9 * math.max(1.0, w) }
      }
    }

  // Privacy.tClosenessReport == brute-force TVD over the full domain
  property("t-closeness TVD == brute force") =
    Prop.forAll(Gen.listOfN(50,
      Gen.zip(Gen.choose(0, 4), Gen.choose(0, 6)))) { raw =>
      raw.isEmpty || {
        val rows = raw.map { case (q, sv) => (s"q$q", sv) }
        val all = rows.map(_._2)
        val got = graft.operators.Privacy.tClosenessReport(
            rows.toDF("qi", "sv"), Seq("qi"), "sv", 0.5)
          .collect()
          .map(r => r.getString(0) -> (r.getAs[Long]("k_size"),
            r.getAs[Double]("tvd"))).toMap
        rows.groupBy(_._1).forall { case (q, rs) =>
          val cls = rs.map(_._2)
          val n = cls.size.toDouble
          val tvd = all.distinct.map { v =>
            math.abs(cls.count(_ == v) / n -
              all.count(_ == v) / all.size.toDouble)
          }.sum / 2
          val (k, t) = got(q)
          k == cls.size && math.abs(t - tvd) < 1e-12
        }
      }
    }

  // bandedHammingPairs == brute-force popcount pairs (completeness AND
  // no false positives) for random 64-bit signatures clustered enough
  // that near pairs actually occur: half the sigs are small
  // perturbations of a shared base value.
  property("banded Hamming pairs == brute force") =
    Prop.forAll(
      Gen.zip(Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.listOfN(12, Gen.zip(Gen.choose(0, 63), Gen.choose(0, 63))),
        Gen.listOfN(6, Gen.choose(Long.MinValue, Long.MaxValue)))) {
      case (base, flips, randoms) =>
        val near = flips.map { case (i, j) =>
          base ^ (1L << i) ^ (1L << j) }
        val sigs = (near ++ randoms).zipWithIndex
          .map { case (s, k) => (k.toLong, s) }
        val got = graft.multimodal.Multimodal.bandedHammingPairs(
            sigs.toDF("media_id", "phash"), "media_id", "phash",
            bits = 64, nBands = 4, maxHamming = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        val vals = sigs.toMap
        val brute = (for {
          a <- vals.keys; bb <- vals.keys if a < bb
          h = java.lang.Long.bitCount(vals(a) ^ vals(bb)) if h <= 2
        } yield (a, bb, h.toLong)).toSet
        got == brute
    }

  // exact heavy hitters: for ANY stream, k, and partitioning, the
  // Misra–Gries candidate phase + exact re-count returns precisely the
  // strict-threshold set {x : f(x)·(k+1) > n} with exact counts — the
  // guaranteed-superset property under merge is what the law exercises
  // (a missed candidate is unrecoverable by the verify phase).
  property("mg heavy hitters == exact strict-threshold set") =
    Prop.forAll(
      Gen.choose(1, 8), Gen.choose(1, 6),
      Gen.listOfN(80, Gen.frequency(
        4 -> Gen.const("hot"), 2 -> Gen.const("warm"),
        3 -> Gen.choose(0, 40).map(i => s"t$i")))) { (k, parts, xs) =>
      xs.isEmpty || {
        val got = graft.operators.HeavyHitters
          .exact(xs.toDF("key").repartition(parts), "key", k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val n = xs.size.toLong
        val brute = xs.groupBy(identity).view
          .mapValues(_.size.toLong)
          .filter { case (_, c) => c * (k + 1) > n }
          .toSet
        got == brute
      }
    }

  // the weighted face: same law with arbitrary non-negative weights —
  // every key whose total weight strictly exceeds W/(k+1), exactly
  property("weighted mg heavy hitters == exact strict-threshold set") =
    Prop.forAll(
      Gen.choose(1, 8), Gen.choose(1, 6),
      Gen.listOfN(60, Gen.zip(
        Gen.frequency(3 -> Gen.const("hot"), 2 -> Gen.const("warm"),
          3 -> Gen.choose(0, 30).map(i => s"t$i")),
        Gen.choose(0L, 50L)))) { (k, parts, xs) =>
      xs.isEmpty || {
        val got = graft.operators.HeavyHitters
          .exactWeighted(xs.toDF("key", "wt").repartition(parts),
            "key", "wt", k)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val w = xs.map(_._2).sum
        val brute = xs.groupBy(_._1).view
          .mapValues(_.map(_._2).sum)
          .filter { case (_, c) => c * (k + 1) > w }
          .toSet
        got == brute
      }
    }
}
