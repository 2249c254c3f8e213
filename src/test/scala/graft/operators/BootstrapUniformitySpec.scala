package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Marginal-uniformity pins for the Poisson-bootstrap mix.
  *
  * The per-replica map m_r = (h·A_r + C_r) mod 2^60 must be an exact
  * bijection of [0, 2^60) — a biased marginal silently biases every
  * bootstrap CI (an earlier two-short-multiplier mix simulated
  * per-replica mean weights of 0.89–1.04 instead of 1.0). These tests
  * replay the REAL mixConstants/threshold pipeline in plain Scala over
  * md5-hashed unit ids and assert the Poisson(1) marginals land where
  * they must: mean weight ≈ 1, P(w=0) ≈ e⁻¹ ≈ 0.3679, for EVERY
  * replica individually (the failure mode was per-replica, so a
  * pooled check would hide it).
  */
class BootstrapUniformitySpec extends AnyFunSuite {

  private val mask30 = (1L << 30) - 1

  private def md5Long(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def mixScala(h: Long, rep: Int,
      cs: (Seq[Long], Seq[Long], Seq[Long])): Long = {
    val (alos, ahis, offs) = cs
    val hLo = h & mask30
    val hHi = h >> 30
    val cross = (hLo * ahis(rep) + hHi * alos(rep)) & mask30
    (hLo * alos(rep) + (cross << 30) + offs(rep)) % (1L << 60)
  }

  private def weight(m: Long): Long = {
    val k = Bootstrap.poisson1CdfT.indexWhere(m < _)
    if (k == -1) Bootstrap.poisson1CdfT.size.toLong else k.toLong
  }

  test("multipliers are odd (units of Z/2^60) and constants in range") {
    val (alos, ahis, offs) = Bootstrap.mixConstants(100)
    assert(alos.forall(a => (a & 1L) == 1L), "A_lo must be odd")
    assert(alos.forall(a => a >= 0 && a <= mask30))
    assert(ahis.forall(a => a >= 0 && a <= mask30))
    assert(offs.forall(c => c >= 0 && c < (1L << 60)))
    // distinct multipliers across replicas (decorrelation needs it)
    assert(alos.zip(ahis).distinct.size == 100)
  }

  test("split product == BigInt h*A + C mod 2^60 (the map IS h·A+C)") {
    val cs = Bootstrap.mixConstants(8)
    val (alos, ahis, offs) = cs
    for (rep <- 0 until 8; i <- 0 until 200) {
      val h = md5Long(s"bij:$i")
      val a = BigInt(ahis(rep)) * (BigInt(1) << 30) + BigInt(alos(rep))
      val want = ((BigInt(h) * a + BigInt(offs(rep))) %
        (BigInt(1) << 60)).toLong
      assert(mixScala(h, rep, cs) == want, s"rep=$rep i=$i")
    }
  }

  test("per-replica Poisson(1) marginals: mean ≈ 1, P(0) ≈ e⁻¹") {
    val b = 20
    val n = 20000
    val cs = Bootstrap.mixConstants(b)
    val hashes = (0 until n).map(i => md5Long(s"unif:$i"))
    for (rep <- 0 until b) {
      val ws = hashes.map(h => weight(mixScala(h, rep, cs)))
      val mean = ws.sum.toDouble / n
      val p0 = ws.count(_ == 0L).toDouble / n
      // 3-sigma bands for n=20000: sd(mean)≈1/√n≈0.0071,
      // sd(p0)≈√(p(1-p)/n)≈0.0034
      assert(math.abs(mean - 1.0) < 0.03, s"rep=$rep mean=$mean")
      assert(math.abs(p0 - math.exp(-1)) < 0.015, s"rep=$rep p0=$p0")
    }
  }
}
