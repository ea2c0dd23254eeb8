package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inter-annotator agreement over label columns — the audit layer for
  * multi-model annotation runs ([[Annotate.llmLabel]] outputs, human
  * labels, heuristic classifiers): before training on LLM labels you
  * measure whether the annotators agree above chance, and you resolve
  * disagreements with an explicit, replayable vote.
  *
  * Everything reduces to integer label counts, so the numbers replay
  * bit-exactly in an external engine: Cohen's kappa is computed as the
  * exact integer ratio (agree·n − Σ_l rowMarg_l·colMarg_l) /
  * (n² − Σ_l rowMarg_l·colMarg_l) — the usual (pₒ−pₑ)/(1−pₑ) with both
  * sides multiplied by n², no intermediate double division — rounded
  * once at the end.
  */
object Agreement {

  /** Pairwise Cohen's kappa between two label columns. Rows where
    * EITHER side is null are excluded (an abstention is not agreement
    * or disagreement). One row: (n, po, pe, kappa), 6-rounded; kappa is
    * null for the degenerate pe = 1 frame (a single shared label —
    * chance explains everything, kappa undefined).
    *
    * Shape: one K²-row pair-count aggregate (K = label-vocabulary
    * size), two K-row marginal aggregates joined on the label, one
    * final fold — corpus-scale work is the first aggregate only,
    * map-side combined.
    */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val t = df.where(col(colA).isNotNull && col(colB).isNotNull)
      .select(col(colA).as("__la"), col(colB).as("__lb"))
    val counts = t.groupBy("__la", "__lb").agg(count(lit(1)).as("__c"))
    val rowM = counts.groupBy("__la").agg(sum("__c").as("__ra"))
    val colM = counts.groupBy("__lb").agg(sum("__c").as("__rb"))
    // decimal(38,0), not Long: n², agree·n, and Σ rowMarg·colMarg all
    // overflow LongType past ~3e9 labeled rows (an ANSI-mode error at
    // the corpus scale this repo targets); exact decimal keeps the
    // integer-ratio contract to n ≈ 1e19
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = rowM.join(colM, col("__la") === col("__lb"))
      .agg(coalesce(sum(col("__ra").cast(dec) * col("__rb").cast(dec)),
        lit(0L).cast(dec)).as("__s"))
    counts
      .agg(coalesce(sum("__c"), lit(0L)).as("__n"),
        coalesce(sum(when(col("__la") === col("__lb"), col("__c"))
          .otherwise(0L)), lit(0L)).as("__agree"))
      .crossJoin(broadcast(s)) // 1-row scalar idiom
      .withColumn("__n2", col("__n").cast(dec) * col("__n").cast(dec))
      .select(
        col("__n").as("n"),
        // n = 0 (empty/all-abstained frame) → null ratios, not a
        // DIVIDE_BY_ZERO under ANSI mode
        when(col("__n") > 0,
          round(col("__agree").cast("double") / col("__n"), 6)).as("po"),
        when(col("__n") > 0,
          round(col("__s").cast("double") / col("__n2").cast("double"), 6)).as("pe"),
        when(col("__n2") =!= col("__s"),
          round((col("__agree").cast(dec) * col("__n").cast(dec) - col("__s"))
            .cast("double") /
            (col("__n2") - col("__s")).cast("double"), 6)).as("kappa"))
  }

  /** Majority vote across annotator columns: per row, the label with
    * the most non-null votes (null when the top count is tied —
    * a resolver must not invent a winner), plus `n_votes` and
    * `agreement` = top-count / n_votes (the vote's confidence, present
    * even when tied). Rows where every annotator abstained get
    * n_votes = 0 and null label/agreement.
    *
    * Shape: explode the K vote columns (rows × K, K parameter-sized),
    * two keyed aggregates, one join back — no per-row array lambdas.
    */
  def majorityVote(
      df: DataFrame, idCol: String, labelCols: Seq[String],
      outCol: String = "label_major",
  ): DataFrame = {
    require(labelCols.size >= 2, s"majorityVote needs >= 2 label columns")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column")
    val votes = df
      .select(col(idCol).as("__mv_id"),
        explode(array(labelCols.map(col): _*)).as("__lbl"))
      .where(col("__lbl").isNotNull)
    val counts = votes.groupBy("__mv_id", "__lbl").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("__mv_id")
    val resolved = counts
      .withColumn("__m", max("__c").over(w))
      .withColumn("__nv", sum("__c").over(w))
      .where(col("__c") === col("__m"))
      .groupBy(col("__mv_id"), col("__m"), col("__nv"))
      .agg(count(lit(1)).as("__ties"), min(col("__lbl")).as("__top"))
      .select(col("__mv_id"),
        when(col("__ties") === 1, col("__top")).as(outCol),
        col("__nv").as("n_votes"),
        round(col("__m").cast("double") / col("__nv"), 6).as("agreement"))
    df.join(resolved, col(idCol) === col("__mv_id"), "left")
      .drop("__mv_id")
      .withColumn("n_votes", coalesce(col("n_votes"), lit(0L)))
  }
}
