package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** TRAINED language identification — hashed character-n-gram linear
  * models, one-vs-rest, on [[TextClassifier]]'s fixed-point GD — the
  * fastText langid recipe (Joulin et al. 2016; fastText's lid.176 is
  * exactly char-n-gram features + a linear head). The repo's own audit
  * demanded this: p94 measured the n-gram-ARGMAX HEURISTIC
  * ([[TextAnalysis]].languageId) predicting 'en' for ~90% of every
  * label on the synthetic corpus — a fixed rule carries no learned
  * signal. This model learns whatever signal the labeled corpus
  * actually has, and is offered BESIDE the heuristic (reference
  * behavior kept; the trained path is the quality upgrade).
  *
  * Everything is oracle-replayable, by the same construction as
  * [[TextClassifier]]: character n-grams are substring arithmetic,
  * bucket hashing is the portable FNV-1a64 mod a power of two, each
  * per-language trajectory is the p53 fixed-point GD (sigmoid rounded
  * to the 1e9 grid, everything else exact integers), and prediction is
  * an INTEGER argmax over per-language margins (no sigmoid at all —
  * σ is monotone, so comparing margins is comparing probabilities;
  * ties break to the earliest language in `langs`, a total order both
  * engines spell identically).
  *
  * Scale shape: the gram frame is one explode + one (doc, bucket)
  * count aggregate, cached across the L×epochs training passes (train
  * on a labeled SAMPLE at 100 TB — the budget knob is the input frame,
  * same as [[Annotate.llmDistillScreen]]'s samplePredicate). Prediction
  * is ONE gram scan and ONE doc-keyed aggregate computing all L margins
  * together (the weight vectors ride as literals; at ~1M-bucket
  * production sizes swap for a broadcast weights join), not L passes.
  */
object LangId {

  /** Per-language binary models over a shared bucket space. */
  final case class MultiModel(
      langs: Seq[String], weights: Seq[Array[Long]], numBuckets: Int) {
    require(langs.nonEmpty && langs.distinct == langs,
      s"langs must be distinct and non-empty: $langs")
    require(weights.length == langs.length)
    weights.foreach(w => require(w.length == numBuckets))
  }

  /** Hashed character-n-gram counts: (doc, bucket, c, n) — every
    * length-`n` substring of the raw text (spaces included — crossing
    * a word boundary IS signal: 'e_d' patterns differ by language),
    * FNV-hashed into `numBuckets` (power of two, oracle-portable
    * modulus). Docs shorter than `n` chars have no grams and are
    * absent, mirrored by the oracle's empty range.
    */
  def charNgramFeatures(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numBuckets: Int = 256,
  ): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two (oracle-portable modulus): $numBuckets")
    GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(col(idCol).as("doc"), col(textCol).as("__t"))
      // guard BEFORE sequence(): Spark's sequence(1, len-n+1) with
      // len < n runs DOWNWARD ([1,0]) instead of empty
      .where(length(col("__t")) >= n)
      .select(col("doc"),
        expr(s"explode(sequence(1, length(__t) - ${n - 1}))").as("p"),
        col("__t"))
      .select(col("doc"), expr(s"substring(__t, p, $n)").as("g"))
      .withColumn("bucket",
        pmod(GraftFunctions.fnv1a64(col("g")), lit(numBuckets.toLong)).cast("int"))
      .groupBy("doc", "bucket").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("doc")))
  }

  /** Train one binary model per language in `langs` (one-vs-rest) on
    * the labeled frame — the gram aggregate is computed ONCE and cached
    * across all L trajectories; only the 0/1 label column changes per
    * class. Rows whose label is outside `langs` still train (as
    * negatives for every class), matching the oracle's CASE.
    */
  def train(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      langs: Seq[String], n: Int = 3, numBuckets: Int = 256,
      epochs: Int = 2, lrNum: Long = 1, lrDen: Long = 2,
  ): MultiModel = {
    val grams = OperatorCache.materialize(
      charNgramFeatures(df, idCol, textCol, n, numBuckets))
    val labels = df.select(col(idCol).as("doc"), col(labelCol).as("__lang"))
    val weights = langs.map { l =>
      val feats = grams.join(labels, "doc")
        .withColumn("y", (col("__lang") === l).cast("long"))
        .select("doc", "y", "bucket", "c", "n")
      TextClassifier.trainOnFeatures(feats, numBuckets, epochs, lrNum, lrDen)
        .weights
    }
    MultiModel(langs, weights, numBuckets)
  }

  /** Predict a language per doc: (doc, lang_pred, margin) — argmax of
    * the per-language integer margins Σ c_b·w_b (ties → earliest lang
    * in `langs`), computed in ONE doc-keyed aggregate. Docs with no
    * grams are absent (nothing to identify).
    */
  def predict(
      df: DataFrame, idCol: String, textCol: String, model: MultiModel,
      n: Int = 3,
  ): DataFrame = {
    val grams = charNgramFeatures(df, idCol, textCol, n, model.numBuckets)
    val margins: Seq[Column] = model.weights.zipWithIndex.map { case (w, i) =>
      sum(col("c") * element_at(typedlit(w.toSeq), col("bucket") + 1))
        .as(s"__m$i")
    }
    val agg = grams.groupBy("doc").agg(margins.head, margins.tail: _*)
    // max margin, ties to the SMALLEST language index: struct ordering
    // compares (margin, -index) lexicographically — the same total
    // order the oracle's >=-chained CASE implements
    val best = array_max(array(model.langs.indices.map(i =>
      struct(col(s"__m$i").as("m"), lit(-i).as("ni"))): _*))
    agg.select(col("doc"),
      element_at(typedlit(model.langs), -best.getField("ni") + 1)
        .as("lang_pred"),
      best.getField("m").as("margin"))
  }

  /** Confusion matrix of the TRAINED predictor against gold labels —
    * the trained sibling of [[TextAnalysis.langIdConfusion]]:
    * (lang, lang_pred, n_docs, share), share = P(pred | true), so
    * diagonal rows read as per-language recall.
    */
  def confusion(
      df: DataFrame, idCol: String, textCol: String, labelCol: String,
      model: MultiModel, n: Int = 3,
  ): DataFrame = {
    val tot = Window.partitionBy("lang")
    predict(df, idCol, textCol, model, n)
      .join(df.select(col(idCol).as("doc"), col(labelCol).as("lang")), "doc")
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          sum("n_docs").over(tot).cast("double"), 6))
  }
}
