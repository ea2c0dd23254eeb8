package graft
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A/B timing for the language-ID hot path — not part of the library API. */
object ProfileLangid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()

    val words = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "was",
      "el", "la", "de", "que", "y", "en", "un", "los", "se", "por",
      "der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein",
      "le", "les", "et", "des", "est", "une", "dans", "pour")
    def padded(c: Column) = concat(lit(" "), regexp_replace(lower(c), "[^a-z0-9_]+", "  "), lit(" "))

    def time(name: String)(mk: Column => Column): Unit = {
      val q = docs.select(col("doc_id"), mk(col("text")).as("x"))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min=${times.min}%.2f")
    }

    time("regex-alternation") { t =>
      val lowered = lower(t)
      words.grouped(10).map(g =>
        regexp_count(lowered, lit(g.mkString("\\b(", "|", ")\\b")))).reduce(_ + _)
    }
    time("padded-only") { t => length(padded(t)) }
    time("replace-measure") { t =>
      val p = padded(t)
      words.map { w =>
        (length(p) - length(replace(p, lit(s" $w "), lit("")))) / (w.length + 2)
      }.reduce(_ + _)
    }
    time("count-substr") { t =>
      val p = padded(t)
      words.map(w => graft.functions.GraftFunctions.countSubstr(p, lit(s" $w "))).reduce(_ + _)
    }
    time("count-substr-nocse") { t =>
      words.map(w => graft.functions.GraftFunctions.countSubstr(padded(t), lit(s" $w "))).reduce(_ + _)
    }
    time("count-words-in") { t =>
      graft.functions.GraftFunctions.countWordsIn(padded(t), words)
    }
    time("full-analyze") { t =>
      // the real p10 shape: all columns, giant projection
      struct(graft.pipeline.TextAnalysis.qualityFeatures(t).map(_._2) :+
        graft.pipeline.TextAnalysis.languageId(t): _*)
    }
    time("quality-only") { t => graft.pipeline.TextAnalysis.qualityScore(t) }
    time("langid-only") { t => graft.pipeline.TextAnalysis.languageId(t) }
    time("quality+langid") { t =>
      struct(graft.pipeline.TextAnalysis.qualityScore(t),
        graft.pipeline.TextAnalysis.languageId(t))
    }
    // the p15 scored-frame shape: quality + langid as separate columns,
    // then the filter on both
    def timeDf(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min=${times.min}%.2f")
    }
    timeDf("p15-scored-filter") {
      docs.withColumn("quality", graft.pipeline.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", graft.pipeline.TextAnalysis.languageId(col("text")))
        .where(col("quality") >= 0.2 && col("lang_pred").isin("en", "und"))
    }
    timeDf("p15-scored-barrier") {
      docs.withColumn("quality", graft.pipeline.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", graft.pipeline.TextAnalysis.languageId(col("text")))
        .withColumn("__once", monotonically_increasing_id())
        .where(col("quality") >= 0.2 && col("__once") >= 0 &&
          col("lang_pred").isin("en", "und"))
        .drop("__once")
    }
    for ((name, df) <- Seq(
      "pushed" -> docs
        .withColumn("quality", graft.pipeline.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", graft.pipeline.TextAnalysis.languageId(col("text")))
        .where(col("quality") >= 0.2 && col("lang_pred").isin("en", "und")),
      "barrier" -> docs
        .withColumn("quality", graft.pipeline.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang_pred", graft.pipeline.TextAnalysis.languageId(col("text")))
        .withColumn("__once", monotonically_increasing_id())
        .where(col("quality") >= 0.2 && col("__once") >= 0 &&
          col("lang_pred").isin("en", "und"))
        .drop("__once"))) {
      val plan = df.queryExecution.optimizedPlan.toString
      println(s"$name plan: ${plan.length} chars, " +
        s"graft_count_words_in x${"graft_count_words_in".r.findAllIn(plan).size}")
    }
    spark.stop()
  }
}
