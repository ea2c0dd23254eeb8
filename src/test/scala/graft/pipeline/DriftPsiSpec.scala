package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PSI drift contracts: identical distributions score 0, a shifted
  * distribution scores the hand-computed value, zero bins contribute
  * their smoothed term, and the statistic is symmetric-signed
  * (PSI ≥ 0 always).
  */
class DriftPsiSpec extends SparkSpec {
  import spark.implicits._

  private def psiOf(refVals: Seq[Int], curVals: Seq[Int], nBins: Int): Double =
    TextAnalysis.driftPsi(
      refVals.map(v => Tuple1(v)).toDF("v"),
      curVals.map(v => Tuple1(v)).toDF("v"),
      Seq(("f", col("v"), nBins)))
      .collect().head.getDouble(1)

  /** Reference implementation on the driver. */
  private def psiHand(refVals: Seq[Int], curVals: Seq[Int], nBins: Int): Double = {
    val micro = (0 until nBins).map { b =>
      val pr = (refVals.count(_ == b) + 1.0) / (refVals.size + nBins)
      val pc = (curVals.count(_ == b) + 1.0) / (curVals.size + nBins)
      math.round((pc - pr) * math.log(pc / pr) * 1e12)
    }.sum
    BigDecimal(micro / 1e12).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("identical distributions drift 0") {
    val vals = Seq(0, 0, 1, 1, 2, 3, 3, 3)
    assert(psiOf(vals, vals, 4) == 0.0)
  }

  test("shifted distribution matches the hand formula, including zero bins") {
    val ref = Seq(0, 0, 0, 1, 1, 2)
    val cur = Seq(2, 2, 3, 3, 3, 3) // bins 0,1 empty on cur; 3 empty on ref
    assert(psiOf(ref, cur, 4) == psiHand(ref, cur, 4))
    assert(psiOf(ref, cur, 4) > 0.1, "a real shift must alert")
  }

  test("PSI is non-negative and grows with divergence") {
    val ref = Seq.fill(50)(0) ++ Seq.fill(50)(1)
    val mild = Seq.fill(40)(0) ++ Seq.fill(60)(1)
    val wild = Seq.fill(5)(0) ++ Seq.fill(95)(1)
    val a = psiOf(ref, mild, 2)
    val b = psiOf(ref, wild, 2)
    assert(a >= 0.0 && b > a, s"mild=$a wild=$b")
  }

  test("multiple features report independently") {
    val ref = Seq((0, 5), (1, 5), (0, 5)).toDF("a", "b")
    val cur = Seq((1, 5), (1, 5), (0, 5)).toDF("a", "b")
    val m = TextAnalysis.driftPsi(ref, cur,
      Seq(("fa", col("a"), 2), ("fb", least(col("b"), lit(9)), 10)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("fb") == 0.0, "unchanged feature must score 0")
    assert(m("fa") > 0.0, "changed feature must score > 0")
  }
}
