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

  test("low-bit FNV congruence must not collapse the k probes (r14 regression)") {
    // The pre-r14 scheme masked FNV's raw low bits (a weak mod-2^b hash
    // — the multiply never mixes high bits downward) and APPENDED the
    // salt, so a low-bit h1 collision survived the salt bytes and h2
    // collided too: all k probes coincided and the colliding doc was
    // falsely bloom-dropped (sf0.1 docs 1306/4093, caught live by
    // RecrawlScaleBench). Reconstruct the mechanism on a found pair,
    // then assert the folded+prefixed scheme separates it.
    def fnv(s: String): Long =
      s.getBytes("UTF-8").foldLeft(-3750763034362895579L)((h, b) =>
        (h ^ (b & 0xffL)) * 1099511628211L)
    val bits = 12
    val mask = (1L << bits) - 1
    // deterministic search: first low-12-bit colliding pair of keys
    val keys = Iterator.from(0).map(i => s"synthetic document number $i")
    val seen = scala.collection.mutable.Map.empty[Long, String]
    val (ka, kb) = keys.map(k => (seen.put(fnv(k) & mask, k), k))
      .collectFirst { case (Some(prev), k) => (prev, k) }.get
    assert(fnv(ka) != fnv(kb) && (fnv(ka) & mask) == (fnv(kb) & mask))
    // the mechanism: an APPENDED salt preserves the low-bit congruence
    // (this is the line that made the old scheme collapse) ...
    assert((fnv(ka + "#bloom") & mask) == (fnv(kb + "#bloom") & mask),
      "appended salt must propagate the congruence — the documented flaw")
    // ... while the shipped scheme (fold high word + PREFIX salt) gives
    // the pair distinct probe sets at the same 2^12 sizing
    val df = Seq((1L, ka), (2L, kb)).toDF("id", "text")
    val pos = df.select(col("id"),
      array(BloomGate.positions(col("text"), 1 << bits, 4): _*).as("pos"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(pos(1L).toSet != pos(2L).toSet,
      s"low-bit-colliding keys must not share all k positions: $pos")
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
