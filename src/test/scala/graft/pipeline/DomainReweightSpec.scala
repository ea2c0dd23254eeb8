package graft.pipeline

import graft.SparkSpec

class DomainReweightSpec extends SparkSpec {
  import spark.implicits._

  // domain "rep" is maximally predictable (one repeated token => low
  // NLL); "mix" uses rarer tokens (higher NLL => excess loss)
  private lazy val out = Curation.domainReweight(
    Seq(
      (1L, "rep", "common common common common common common"),
      (2L, "rep", "common common common common common"),
      (3L, "mix", "zeta omega common kappa lambda"),
      (4L, "mix", "theta sigma common upsilon pi")).toDF("id", "dom", "text"),
    "id", "text", "dom")
    .orderBy("domain")
    .collect()

  test("weights form a distribution") {
    val sum = out.map(_.getDouble(5)).sum
    assert(math.abs(sum - 1.0) < 1e-4, s"weights sum to $sum")
  }

  test("excess-loss domain is upweighted relative to its token share") {
    val byDom = out.map(r => r.getString(0) ->
      (r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    val (mixToks, mixExcess, mixW) = byDom("mix")
    val (repToks, repExcess, repW) = byDom("rep")
    val total = (mixToks + repToks).toDouble
    assert(mixExcess > 0.0)
    assert(repExcess === 0.0, "below-reference domain clips to zero excess")
    assert(mixW > mixToks / total, "hard domain gains share")
    assert(repW < repToks / total, "easy domain cedes share")
  }

  test("uniform corpus degenerates to token shares") {
    val uni = Curation.domainReweight(
      Seq((1L, "a", "x y z"), (2L, "b", "x y z")).toDF("id", "dom", "text"),
      "id", "text", "dom").orderBy("domain").collect()
    uni.foreach(r => assert(r.getDouble(5) === 0.5))
  }
}
