package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained language ID ([[LangId]]): hashed char-n-gram one-vs-rest
  * linear models must actually LEARN a labeled fixture's signal — the
  * upgrade p94 demanded of the heuristic — and stay deterministic
  * (fixed-point GD + integer-argmax prediction).
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("de", "en", "es", "fr")
  private val vocab = Map(
    "de" -> Seq("der", "und", "sch", "ein", "nicht", "mit"),
    "en" -> Seq("the", "and", "with", "that", "have", "this"),
    "es" -> Seq("que", "los", "una", "por", "con", "para"),
    "fr" -> Seq("les", "des", "une", "est", "dans", "pour"))

  private def fixture(ids: Range) = ids.map { i =>
    val l = langs(i % langs.length)
    val w = vocab(l)
    val text = (0 until 12).map(j => w((i + j * 5) % w.length)).mkString(" ")
    (i.toLong, l, text)
  }.toDF("doc_id", "lang", "text")

  test("trained langid separates a labeled fixture; heuristic cannot") {
    val train = fixture(0 until 80)
    val eval0 = fixture(80 until 160)
    val model = LangId.train(train, "doc_id", "text", "lang", langs,
      n = 3, numBuckets = 256, epochs = 2)
    val conf = LangId.confusion(eval0, "doc_id", "text", "lang", model)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    OperatorCache.releaseAll(spark)
    val diag = conf.filter(c => c._1 == c._2).map(c => c._1 -> c._3).toMap
    langs.foreach { l =>
      val recall = diag.getOrElse(l, 0L).toDouble / 20.0
      assert(recall >= 0.9,
        s"per-language recall must be high on held-out docs: $l=$recall ($conf)")
    }
  }

  test("prediction is a deterministic integer argmax; ties break to the earliest lang") {
    // a model with IDENTICAL weight vectors for two langs: every doc
    // ties, and the earliest lang in `langs` must win every time
    val w = Array.tabulate(8)(b => b.toLong)
    val model = LangId.MultiModel(Seq("aa", "bb"), Seq(w, w.clone()), 8)
    val preds = LangId.predict(
      Seq((1L, "hello world"), (2L, "zzz yyy")).toDF("doc_id", "text"),
      "doc_id", "text", model, n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(preds == Seq((1L, "aa"), (2L, "aa")), s"got $preds")

    // short docs (< n chars) have no grams and are absent, not null
    val none = LangId.predict(Seq((3L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text", model, n = 3)
    assert(none.isEmpty)
  }

  test("the two feature extractors share one GD: word-unigram train still converges") {
    // sanity pin on the trainOnFeatures refactor: TextClassifier.train
    // through the shared loop reproduces the classic separable case
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, 1, "quality prose here")
      else (i.toLong, 0, "junk filler noise")
    }.toDF("doc_id", "y", "text")
    val m = TextClassifier.train(docs, "doc_id", "text", "y",
      numBuckets = 64, epochs = 3)
    val sc = TextClassifier.score(docs, "doc_id", "text", "y", m)
      .select("doc", "pred", "y").collect()
    OperatorCache.releaseAll(spark)
    assert(sc.forall(r => r.getInt(1).toLong == r.getLong(2)),
      "shared GD loop must still separate the word-level classes")
  }
}
