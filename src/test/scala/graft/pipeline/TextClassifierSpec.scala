package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable two-topic fixture: fruit docs (y=1) vs infra docs
  // (y=0) with disjoint vocabularies
  private def fixture = Seq(
    (1L, "apple pear plum apple", 1),
    (2L, "pear apple cherry plum pear", 1),
    (3L, "plum cherry apple pear cherry", 1),
    (4L, "cherry plum pear apple", 1),
    (5L, "router switch cable router", 0),
    (6L, "switch router socket cable socket", 0),
    (7L, "cable socket router switch switch", 0),
    (8L, "socket cable switch router", 0),
  ).toDF("doc_id", "text", "y")

  test("train separates disjoint-vocabulary classes; scores move off 0.5 the right way") {
    val model = TextClassifier.train(fixture, "doc_id", "text", "y",
      numBuckets = 64, epochs = 3)
    val out = TextClassifier.score(fixture, "doc_id", "text", "y", model)
      .orderBy("doc").collect()
    out.foreach { r =>
      val (doc, s9, pred, y) = (r.getLong(0), r.getLong(2), r.getInt(3), r.getLong(4))
      assert(pred == y, s"doc $doc predicted $pred, label $y (score9=$s9)")
      if (y == 1) assert(s9 > TextClassifier.Scale / 2, s"doc $doc: $s9")
      else assert(s9 < TextClassifier.Scale / 2, s"doc $doc: $s9")
    }
    // more epochs → scores strictly more confident on this fixture
    val model5 = TextClassifier.train(fixture, "doc_id", "text", "y",
      numBuckets = 64, epochs = 5)
    val conf3 = out.map(r => math.abs(r.getLong(2) - TextClassifier.Scale / 2)).sum
    val conf5 = TextClassifier.score(fixture, "doc_id", "text", "y", model5)
      .collect().map(r => math.abs(r.getLong(2) - TextClassifier.Scale / 2)).sum
    assert(conf5 > conf3, s"epochs 5 ($conf5) not more confident than 3 ($conf3)")
    OperatorCache.releaseAll(spark)
  }

  test("training trajectory is partitioning-invariant (the provenance property)") {
    val a = TextClassifier.train(fixture, "doc_id", "text", "y",
      numBuckets = 64, epochs = 3)
    val b = TextClassifier.train(fixture.repartition(7), "doc_id", "text", "y",
      numBuckets = 64, epochs = 3)
    assert(a.weights.toSeq == b.weights.toSeq,
      "weights differ across physical partitionings")
    OperatorCache.releaseAll(spark)
  }

  test("screen keeps scorers above the floor with original columns; empty docs always drop") {
    val model = TextClassifier.train(fixture, "doc_id", "text", "y",
      numBuckets = 64, epochs = 3)
    val corpus = fixture.union(Seq((9L, "   ", 1)).toDF("doc_id", "text", "y"))
      .withColumn("extra", col("doc_id") * 10)
    val kept = TextClassifier.screen(corpus, "doc_id", "text", model,
      minScore9 = TextClassifier.Scale / 2 + 1)
    // the screen is a pure row filter: the frame keeps its shape
    assert(kept.columns.toSeq == corpus.columns.toSeq)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L), s"got $ids")
    // a zero floor keeps every scoreable doc but still drops the empty
    // one — a quality screen that passes empty docs would be a bug
    val all = TextClassifier.screen(corpus, "doc_id", "text", model, 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(all == (1L to 8L).toSet, s"got $all")
    OperatorCache.releaseAll(spark)
  }

  test("calibrationCard: perfect and inverted scores land at gap 0 and ~1") {
    // hand-built score frames (the card is score-frame → card, no
    // training involved): a perfectly calibrated bin has mean
    // probability == positive rate; an anti-calibrated one has gap ~1
    def frame(rows: Seq[(Long, Long, Int)]) =
      rows.map { case (d, s9, y) => (d, 10L, s9, if (s9 > 500000000L) 1 else 0, y) }
        .toDF("doc", "n_tokens", "score9", "pred", "y")
    // bin 9 (score 0.95): 4 docs, 3 positive — mean 0.95 vs rate 0.75
    val card = TextClassifier.calibrationCard(frame(Seq(
      (1L, 950000000L, 1), (2L, 950000000L, 1),
      (3L, 950000000L, 1), (4L, 950000000L, 0))))
      .collect()
    assert(card.length == 1 && card.head.getInt(0) == 9)
    assert(card.head.getLong(1) == 4 && card.head.getDouble(2) == 0.95)
    assert(card.head.getDouble(3) == 0.75 && card.head.getDouble(4) == 0.2)
    // anti-calibrated: high scores, all negatives → gap == mean score
    val bad = TextClassifier.calibrationCard(frame(Seq(
      (1L, 990000000L, 0), (2L, 990000000L, 0))))
      .collect().head
    assert(bad.getDouble(3) == 0.0 && bad.getDouble(4) == 0.99)
    // boundary: score9 == 1e9 clamps into the last bin, not bin 10
    val edge = TextClassifier.calibrationCard(frame(Seq((1L, 1000000000L, 1))))
      .collect().head
    assert(edge.getInt(0) == 9 && edge.getDouble(4) == 0.0)
    // empty bins yield no rows
    assert(TextClassifier.calibrationCard(frame(Nil)).count() == 0)
  }

  test("zero-token docs are absent; non-power-of-two buckets rejected") {
    val withEmpty = fixture.union(Seq((9L, "   ", 1)).toDF("doc_id", "text", "y"))
    val model = TextClassifier.train(withEmpty, "doc_id", "text", "y",
      numBuckets = 64, epochs = 1)
    val scoredIds = TextClassifier.score(withEmpty, "doc_id", "text", "y", model)
      .select("doc").as[Long].collect().toSet
    assert(scoredIds == (1L to 8L).toSet, s"got $scoredIds")
    intercept[IllegalArgumentException](
      TextClassifier.train(fixture, "doc_id", "text", "y", numBuckets = 100))
    OperatorCache.releaseAll(spark)
  }
}
