package graft.pipeline

import graft.SparkSpec

/** Feature-hashing contracts: hand-checked bucket/sign arithmetic,
  * unit norm, cancellation drops, empty docs, partitioning invariance.
  */
class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def vec(text: String): Map[Int, Double] =
    TextAnalysis.hashEmbed(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap

  private def bucketSign(tok: String): (Int, Long) = {
    val h = graft.functions.Fnv1a64.hash(
      tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (java.lang.Math.floorMod(h, 16L).toInt, if (((h >> 31) & 1L) == 1L) 1L else -1L)
  }

  test("single token: its bucket carries exactly sign/1.0") {
    val (b, s) = bucketSign("hello")
    assert(vec("hello") == Map(b -> s.toDouble), s"bucket $b sign $s: ${vec("hello")}")
  }

  test("vectors are unit-norm (within rounding)") {
    val v = vec("the quick brown fox jumps over the lazy dog again and again")
    val norm = math.sqrt(v.values.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
  }

  test("repeated tokens weight by term frequency") {
    val (b, s) = bucketSign("solo")
    val (b2, s2) = bucketSign("other")
    assume(b != b2) // distinct buckets for this fixture
    val v = vec("solo solo solo other")
    // w = (3s, s2) → norm sqrt(9+1)
    val n = math.sqrt(10.0)
    assert(v(b) == BigDecimal(3 * s / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(v(b2) == BigDecimal(s2 / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("empty and null docs emit no rows") {
    val out = TextAnalysis.hashEmbed(
      Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "word")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(out.select("doc").distinct().collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("partitioning-invariant") {
    val docs = (0L until 50L).map(i => (i, s"token$i shared words here token${i % 7}"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.hashEmbed(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val b = TextAnalysis.hashEmbed(docs.repartition(11), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
