package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomGateSpec extends SparkSpec {
  import spark.implicits._

  private val numBits = 1 << 12
  private val k = 4

  test("no false negatives: every built doc probes true") {
    val seen = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "The quick brown fox!")).toDF("id", "text")
    val out = BloomGate.gate(seen, seen, "text", numBits, k)
    assert(out.where(!col("maybe_seen")).count() === 0)
  }

  test("normalization ties build and probe: case/punct variants match") {
    val seen = Seq((1L, "The quick brown fox!")).toDF("id", "text")
    val batch = Seq((10L, "the QUICK, brown fox"), (11L, "a different doc"))
      .toDF("id", "text")
    val out = BloomGate.gate(seen, batch, "text", numBits, k)
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    assert(out(10L))
    assert(!out(11L))
  }

  test("fresh docs probe false at low fill (sparse filter)") {
    val seen = (1 to 20).map(i => (i.toLong, s"seen document number $i"))
      .toDF("id", "text")
    val batch = (1 to 50).map(i => (i.toLong, s"brand new material $i"))
      .toDF("id", "text")
    val out = BloomGate.gate(seen, batch, "text", numBits = 1 << 16, k = k)
    // 20 docs * 4 bits in 65536 → P(single fp) ≈ (80/65536)^4 ≈ 2e-12
    assert(out.where(col("maybe_seen")).count() === 0)
  }

  test("bitmap is parameter-sized and build positions are in range") {
    val seen = (1 to 100).map(i => (i.toLong, s"doc $i payload"))
      .toDF("id", "text")
    val bm = BloomGate.build(seen, "text", numBits, k)
    assert(bm.length === numBits / 64)
    assert(bm.exists(_ != 0L))
  }

  test("probe plan is map-only: no shuffle exchange") {
    val seen = Seq((1L, "a b c")).toDF("id", "text")
    val bm = BloomGate.build(seen, "text", numBits, k)
    val plan = BloomGate.probe(Seq((2L, "x y z")).toDF("id", "text"),
      "text", bm, numBits, k).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe should not shuffle:\n$plan")
  }

  test("empty and whitespace-only docs key consistently") {
    val seen = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val batch = Seq((3L, "!!!"), (4L, "real words here")).toDF("id", "text")
    val out = BloomGate.gate(seen, batch, "text", numBits, k)
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    // "!!!" normalizes to the same empty key as "" / "   "
    assert(out(3L))
    assert(!out(4L))
  }
}
