package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{Bins, Headers, TimeFns}
import graft.operators.Dedup

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

  // header normalization is idempotent and emits only [A-Za-z0-9_]
  property("header normalize idempotent + clean") =
    Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { names =>
      names.forall { n =>
        val once = Headers.normalizeName(n)
        Headers.normalizeName(once) == once &&
          once.forall(ch => ch.isLetterOrDigit && ch < 128 || ch == '_')
      }
    }
}
