package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** hllSweep: exact in-memory register recount at every m, plus the
  * structural laws (register-space coverage, error accounting).
  */
class HllSweepSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("hllSweep registers and estimates match an exact recount at " +
      "every register count") {
    import spark.implicits._
    val M = 2147483647L
    def hv(k: Long): Long = {
      val y1 = ((2654435761L * k + 12007L) % M) ^
        (((2654435761L * k + 12007L) % M) >> 15)
      ((1779033703L * y1 + 514229L) % M) ^
        (((1779033703L * y1 + 514229L) % M) >> 13)
    }
    val users = Tables.events(spark, dir)
      .select($"user_id").distinct().as[Long].collect()
    val expect = Seq(16, 64, 256).map { m =>
      val kbits = m match { case 16 => 28; case 64 => 26; case _ => 24 }
      val regs = Array.fill(m)(0)
      users.foreach { u =>
        val h = hv(u)
        val j = (h % m).toInt
        val w = h / m
        val rho =
          if (w == 0) kbits
          else kbits - java.lang.Long.toBinaryString(w).length
        if (rho > regs(j)) regs(j) = rho
      }
      val alpha = m match {
        case 16 => 0.673
        case 64 => 0.709
        case _ => 0.7213 / (1.0 + 1.079 / 256.0)
      }
      val ssum = regs.map(x => math.pow(2.0, -x)).sum
      val est = math.floor(alpha * m * m / ssum).toLong
      val nZero = regs.count(_ == 0).toLong
      m.toLong -> ((nZero, est,
        math.abs(est - users.length) * 1000L / users.length))
    }.toMap
    val got = Sketches.hllSweep(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (m, (nz, est, err)) =>
      assert((nz, est, err) == expect(m), s"m=$m")
    }
    // exact count rides along unchanged
    val exacts = Sketches.hllSweep(spark, dir).collect().map(_.getLong(3))
    assert(exacts.toSet == Set(users.length.toLong))
  }
}
