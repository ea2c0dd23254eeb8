package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** Scale proof for the de-skewed per-domain selection windows
  * (PLANS.md): build a synthetic corpus whose domain distribution is
  * EXTREMELY skewed — one domain holds ~90% of all rows, nine others
  * split the rest — replicate it ×N, and run the three window-bearing
  * curation operators (composeMixture's selection, sampleByTokenBudget,
  * curriculumOrder) against a monolithic single-window re-implementation
  * of the same semantics. Under the old `row_number().over(
  * partitionBy(domain))` shape, the 90% domain is ONE sorted partition:
  * its task time grows linearly with corpus size no matter how many
  * cores exist. The clampBucket shape caps every sort task at ~1/1024
  * of the domain.
  *
  * Also asserts result EQUALITY against the monolithic shape on every
  * run — the de-skew is a plan change, not a semantics change.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.SkewScaleBench [replicas] [--synthetic N]
  *
  * `--synthetic N` swaps the replicated documents corpus for N narrow
  * generated rows (doc_id, domain, n_tokens) — text-free, so the corpus
  * can reach the tens of millions of rows where a monolithic window's
  * single 90%-domain sort task IS the wall clock (at document width
  * that regime needs a cluster; the window-shape question is the same).
  * The curriculum comparison is skipped there (it needs real text; its
  * window is the same bucketed-rank shape selectTopPerDomain proves).
  */
object SkewScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val synthetic = args.sliding(2).collectFirst {
      case Array("--synthetic", n) => n.toLong }
    val replicas = args.filterNot(_.startsWith("--")).filterNot(a =>
      args.sliding(2).exists { case Array(f, v) => f == "--synthetic" && v == a; case _ => false })
      .headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-skew-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90%-mass domain: doc_id % 10 == 0..8 → "head"; else one of 9 tails
    def domained(df: DataFrame): DataFrame = df
      .withColumn("domain",
        when(pmod(col("doc_id"), lit(10)) < 9, lit("head"))
          .otherwise(concat(lit("tail_"), pmod(col("doc_id"), lit(10)))))
    val scaled = (synthetic match {
      case Some(n) =>
        domained(spark.range(n).select(col("id").as("doc_id")))
          .withColumn("text", lit("w"))
          .withColumn("n_tokens", pmod(col("doc_id") * 31L, lit(400L)) + 1L)
      case None =>
        val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
        val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
        domained(docs
          .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
          .select((col("doc_id") + col("copy") * maxId).as("doc_id"), col("text")))
          .withColumn("n_tokens",
            size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")).cast("long"))
    }).persist()
    val nDocs = scaled.count()
    val budgetDocs = nDocs / 20

    def timed(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      n
    }

    // --- monolithic single-window references (the pre-r13 shapes) ---
    def monoSelect(): DataFrame = {
      val w = Window.partitionBy("domain")
        .orderBy(Curation.idGate(col("doc_id")), col("doc_id"))
      scaled.withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= lit(budgetDocs))
        .select(col("doc_id").as("doc"))
    }
    def monoBudget(): DataFrame = {
      val g = Curation.idGate(col("doc_id"), 2)
      val w = Window.partitionBy("domain").orderBy(g.asc, col("doc_id").asc)
      scaled.withColumn("__cum", sum("n_tokens").over(w) - col("n_tokens"))
        .where(col("__cum") < lit(budgetDocs * 40))
        .select("doc_id")
    }
    def monoRank(): DataFrame = {
      val w = Window.partitionBy("domain")
        .orderBy(col("n_tokens").asc, col("doc_id").asc)
      scaled.withColumn("rk", (row_number().over(w) - 1).cast("long"))
        .select(col("doc_id").as("doc"), col("rk"))
    }

    // --- the shipped de-skewed operators, reduced to comparable frames ---
    // (composeMixture's reweight head is domain-grained and identical in
    // both shapes; the skew question is the selection tail, so compare a
    // fixed per-domain target through sampleByStrata-free paths)
    def deskewSelect(): DataFrame = {
      // drive the selection exactly as composeMixture does, with every
      // domain's target = budgetDocs (isolates the window shape)
      import spark.implicits._
      val targets = scaled.select("domain").distinct()
        .withColumn("__target", lit(budgetDocs))
      Curation.selectTopPerDomain(
        scaled.select(col("doc_id"), col("domain")), "doc_id", targets)
        .select(col("doc"))
    }
    def deskewBudget(): DataFrame =
      Curation.sampleByTokenBudget(scaled, "doc_id", "n_tokens", "domain",
        budgets = Map.empty, defaultBudget = budgetDocs * 40)
        .select("doc_id")
    def deskewRank(): DataFrame =
      Curation.curriculumOrder(scaled, "doc_id", "text", "domain")
        .select(col("doc"), col("difficulty"))

    // equality first (cheap anti-join counts), then timed runs
    require(deskewSelect().exceptAll(monoSelect()).isEmpty &&
      monoSelect().exceptAll(deskewSelect()).isEmpty, "select mismatch")
    require(deskewBudget().exceptAll(monoBudget()).isEmpty &&
      monoBudget().exceptAll(deskewBudget()).isEmpty, "budget mismatch")

    println(s"=== skew scale: $nDocs docs, 90% in one domain, target=$budgetDocs")
    timed("select mono")(monoSelect().count())
    timed("select deskew")(deskewSelect().count())
    timed("budget mono")(monoBudget().count())
    timed("budget deskew")(deskewBudget().count())
    if (synthetic.isEmpty) {
      timed("rank mono")(monoRank().count())
      timed("rank deskew")(deskewRank().count())
    }
    spark.stop()
  }
}
