package graft.pipeline

import graft.SparkSpec

class ComposeMixtureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (
    (1 to 30).map(i => (i.toLong, "easy", "common words common words common")) ++
      (31 to 60).map(i => (i.toLong, "hard", s"rare$i tokens rare${i * 3} unusual$i stuff"))
    ).toDF("id", "dom", "text")

  test("apportionment telescopes to exactly the budget while domains cover it") {
    Seq(1L, 7L, 20L, 30L).foreach { b =>
      val n = Curation.composeMixture(corpus, "id", "text", "dom", b).count()
      assert(n === b, s"budget $b produced $n docs")
    }
  }

  test("a starved domain yields what it has; shortfall is visible") {
    // budget 59 over 2x30 docs: the upweighted hard domain's target
    // exceeds its 30 available docs - it yields all 30, the output
    // falls short rather than silently back-filling from 'easy'
    val out = Curation.composeMixture(corpus, "id", "text", "dom", 59L)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(out("hard") === 30L)
    assert(out.values.sum < 59L)
  }

  test("excess-loss domain gets more than its doc share") {
    val out = Curation.composeMixture(corpus, "id", "text", "dom", 20L)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(out("hard") > out("easy"),
      s"hard-domain upweighting must show in the mixture: $out")
  }

  test("selection is deterministic and partitioning-invariant") {
    val a = Curation.composeMixture(corpus, "id", "text", "dom", 15L)
      .select("doc").as[Long].collect().sorted.toSeq
    val b = Curation.composeMixture(corpus.repartition(11), "id", "text", "dom", 15L)
      .select("doc").as[Long].collect().sorted.toSeq
    assert(a === b)
  }
}
