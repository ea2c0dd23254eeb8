package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Inter-annotator agreement contracts: kappa on hand-computable
  * tables, vote resolution incl. ties and abstentions.
  */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: the textbook 2x2 table") {
    // counts: yes/yes 20, yes/no 5, no/yes 10, no/no 15 → n=50,
    // po = 35/50 = 0.7; marginals a: yes 25, no 25; b: yes 30, no 20;
    // pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.2/0.5 = 0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val out = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Double, Double, Double)].head()
    assert(out == ((50L, 0.7, 0.5, 0.4)), s"got $out")
  }

  test("cohenKappa: nulls excluded; degenerate single label → null kappa") {
    val withNulls = Seq(("x", "x"), ("x", null), (null, "x"), ("x", "x"))
      .toDF("a", "b")
    val r = Agreement.cohenKappa(withNulls, "a", "b").head()
    assert(r.getLong(0) == 2 && r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
    assert(r.isNullAt(3), "pe = 1 must yield null kappa, not a 0/0")
    // perfect two-label agreement: kappa = 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Agreement.cohenKappa(perfect, "a", "b").head().getDouble(3) == 1.0)
  }

  test("majorityVote: majorities, ties → null, abstentions, zero-vote rows") {
    val df = Seq(
      (1L, "en", "en", "de"),    // 2-1 majority
      (2L, "en", "de", null),    // 1-1 tie → null, agreement 0.5
      (3L, "en", null, null),    // single vote wins
      (4L, null, null, null),    // all abstain
      (5L, "de", "de", "de"),    // unanimous
    ).toDF("id", "a", "b", "c")
    val out = Agreement.majorityVote(df, "id", Seq("a", "b", "c"))
      .select("id", "label_major", "n_votes", "agreement")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).sortBy(_._1)
    assert(out(0) == ((1L, Some("en"), 3L, 0.666667)))
    assert(out(1) == ((2L, None, 2L, 0.5)), "tie must resolve to null")
    assert(out(2) == ((3L, Some("en"), 1L, 1.0)))
    assert(out(3) == ((4L, None, 0L, -1.0)), "all-abstain row: 0 votes")
    assert(out(4) == ((5L, Some("de"), 3L, 1.0)))
    intercept[IllegalArgumentException](
      Agreement.majorityVote(df, "id", Seq("a")))
  }
}
