package graft.pipeline

import graft.SparkSpec

/** Winnowing contracts (Schleimer et al. 2003): the shared-run
  * guarantee (any common run of ≥ w+k−1 tokens yields a shared
  * fingerprint), short-doc coverage, determinism under repartitioning,
  * and no phantom overlap between disjoint docs.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4
  private val w = 5

  private def fps(docs: Seq[(Long, String)]) =
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // the shared run is w+k-1 = 8 tokens long, embedded in different contexts
    val run = "one two three four five six seven eight"
    val m = fps(Seq(
      (1L, s"prefix tokens here $run suffix words trailing"),
      (2L, s"other opening text entirely $run closing remark")))
    val shared = m(1L).intersect(m(2L))
    assert(shared.nonEmpty,
      s"w+k-1 shared run must winnow to >=1 common fingerprint; got ${m(1L).size}/${m(2L).size} disjoint")
  }

  test("a doc with >= k tokens but < w grams still gets a fingerprint") {
    val m = fps(Seq((1L, "alpha beta gamma delta")))
    assert(m(1L).size == 1, s"4 tokens → 1 gram → 1 fingerprint: ${m.get(1L)}")
  }

  test("a doc with < k tokens gets none") {
    val out = Dedup.winnowFingerprints(
      Seq((1L, "too short here")).toDF("doc_id", "text"), "doc_id", "text", k, w)
    assert(out.count() == 0)
  }

  test("fingerprints are deterministic and partitioning-invariant") {
    val docs = (0L until 40L).map(i =>
      (i, s"document $i talks about topic ${i % 5} in some shared template words"))
    val df = docs.toDF("doc_id", "text")
    val a = Dedup.winnowFingerprints(df, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.winnowFingerprints(df.repartition(13), "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "winnowed set must not depend on physical partitioning")
  }

  test("overlap pairs: disjoint docs never pair, near-dups do") {
    val near = "spark catalyst optimizes the logical plan before tungsten executes it fast"
    val pairs = Dedup.winnowOverlapPairs(Seq(
      (1L, near + " extra tail"),
      (2L, "completely unrelated cooking recipe with flour butter sugar eggs vanilla"),
      (3L, near + " different tail entirely here"),
    ).toDF("doc_id", "text"), "doc_id", "text", k, w, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"near-dups must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"doc 2 is disjoint: $pairs")
  }

  test("property: ANY shared run of w+k-1 tokens yields a shared fingerprint") {
    // 60 random corpora: random vocab, random run placement — the
    // winnowing guarantee must hold everywhere, not just on one fixture
    import org.scalacheck.{Gen, rng}
    val vocab = (0 until 40).map(i => s"v$i")
    val gen = for {
      runToks <- Gen.listOfN(w + k - 1, Gen.oneOf(vocab))
      pre1 <- Gen.listOfN(7, Gen.oneOf(vocab))
      suf1 <- Gen.listOfN(5, Gen.oneOf(vocab))
      pre2 <- Gen.listOfN(3, Gen.oneOf(vocab))
      suf2 <- Gen.listOfN(9, Gen.oneOf(vocab))
    } yield ((pre1 ++ runToks ++ suf1).mkString(" "), (pre2 ++ runToks ++ suf2).mkString(" "))
    val cases = (0 until 60).flatMap(i =>
      gen.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
    // one Spark job for all cases: docs 2i / 2i+1 share case i's run
    val docs = cases.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i + 1, b)) }
    val m = fps(docs)
    cases.indices.foreach { i =>
      assert(m(2L * i).intersect(m(2L * i + 1)).nonEmpty,
        s"case $i: shared ${w + k - 1}-token run produced no shared fingerprint\n" +
          s"a=${cases(i)._1}\nb=${cases(i)._2}")
    }
  }

  test("storage is sub-gram: winnowing selects far fewer than all grams") {
    val text = (0 until 200).map(i => s"tok${i % 37}").mkString(" ")
    val m = fps(Seq((1L, text)))
    val nGrams = 200 - k + 1
    assert(m(1L).size * 2 < nGrams,
      s"selected ${m(1L).size} of $nGrams grams — winnowing should thin to ~2/(w+1)")
  }
}
