package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, OperatorCache}

/** Scale proof for duplicate-span removal (PLANS.md): replicate the
  * sf0.1 documents corpus ×N with remapped ids and remove shared
  * 8-token spans. Replication makes EVERY complete window shared
  * (each doc's text occurs N times), so this measures the operator in
  * its most expensive regime — maximal shared-span set, maximal
  * covered-range explode, maximal cut — while rows grow ×N.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.SpanScaleBench [replicas] [--persist-win] [--substrings]
  *
  * `--persist-win` re-runs the operator's window-frame A/B (see the
  * removeSharedSpans persistWin doc) at this scale. `--substrings`
  * runs removeSharedSubstrings (minLen = 8) instead — same covered
  * set plus the maximal-run lag window and the materialized covered
  * frame, in the same worst-case all-shared regime.
  */
object SpanScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val persistWin = args.contains("--persist-win")
    val replicas = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-span-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val scaled = docs
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("copy") * maxId).as("doc_id"), col("text"))
      .persist()
    val nDocs = scaled.count()

    val substrings = args.contains("--substrings")
    val lines = args.contains("--lines")
    val classifier = args.contains("--classifier")
    val t0 = System.nanoTime()
    val (mode, stats) =
      if (lines) {
        // worst case for p51: after ×N replication every 12-token body
        // line occurs in N docs, so with minDocs=3 and N≥3 EVERY line is
        // boilerplate and the rebuild runs in its maximal-cut regime
        val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
        // clamped like p51: sequence(0,-1) on an empty doc is [0,-1]
        val lined = scaled.select(col("doc_id"),
          array_join(transform(
            sequence(lit(0),
              greatest(floor((size(toks) - 1) / lit(12)).cast("int"), lit(0))),
            i => array_join(slice(toks, i * 12 + 1, lit(12)), " ")), "\n")
            .as("text"))
        val s = Dedup.removeDuplicateLines(lined, "doc_id", "text",
          minDocs = 3, minChars = 10)
          .agg(count(lit(1)), sum("n_lines"), sum("n_lines_removed")).head()
        ("lines", (s.getLong(0), s.getLong(1), s.getLong(2)))
      } else if (classifier) {
        // 3-epoch train + score at ×N: measures the per-epoch
        // (margin agg + gradient agg) shuffles growing with the corpus
        val labeled = scaled.withColumn("y", pmod(col("doc_id"), lit(2L)).cast("int"))
        val model = pipeline.TextClassifier.train(labeled, "doc_id", "text", "y",
          numBuckets = 256, epochs = 3)
        val s = pipeline.TextClassifier.score(labeled, "doc_id", "text", "y", model)
          .agg(count(lit(1)), sum("pred"), sum("score9")).head()
        ("classifier", (s.getLong(0), s.getLong(1), s.getLong(2)))
      } else {
        val frame =
          if (substrings)
            Dedup.removeSharedSubstrings(scaled, "doc_id", "text", minLen = 8)
          else
            Dedup.removeSharedSpans(scaled, "doc_id", "text", k = 8,
              persistWin = persistWin)
        val s = frame
          .agg(count(lit(1)).as("docs_out"),
            sum("n_tokens_kept").as("kept"), sum("n_tokens_dropped").as("dropped"))
          .head()
        (if (substrings) "substrings" else "spans",
          (s.getLong(0), s.getLong(1), s.getLong(2)))
      }
    val sec = (System.nanoTime() - t0) / 1e9
    OperatorCache.releaseAll(spark)

    // key names track what each mode actually aggregates — the span
    // triple's (kept, dropped) labels were wrong for --lines (n_lines,
    // n_lines_removed) and --classifier (sum_pred, sum_score9)
    val (k2, k3) = mode match {
      case "lines"      => ("n_lines", "n_lines_removed")
      case "classifier" => ("sum_pred", "sum_score9")
      case _            => ("kept", "dropped")
    }
    println(s"""{"docs":$nDocs,"replicas":$replicas,"persist_win":$persistWin,""" +
      s""""mode":"$mode","span_sec":${f"$sec%.2f"},"docs_out":${stats._1},""" +
      s""""$k2":${stats._2},"$k3":${stats._3}}""")
    spark.stop()
  }
}
