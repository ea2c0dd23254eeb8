package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints a condensed physical plan per named query so
  * join strategies / pushdown / limits can be eyeballed quickly.
  * Usage: tools/run.sh graft.PlanAudit [--final] [queryName ...]
  * `--final` executes the query (noop sink) first and prints the
  * AQE-final plan — the one that shows runtime exchange/stage reuse.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (flags, queryArgs) = args.partition(_.startsWith("--"))
    val runFinal = flags.contains("--final")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (queryArgs.nonEmpty) queryArgs.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val interesting = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "Exchange", "TakeOrdered",
      "GlobalLimit", "CollectLimit", "Window", "HashAggregate", "SortAggregate",
      "ObjectHashAggregate", "Generate", "PushedFilters", "QueryStage",
      "ReusedExchange", "ReusedSubquery")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try {
          val q = fn(spark, dir)
          // collect() drives THIS QueryExecution (a write would re-plan a
          // separate one), leaving the AQE-final plan behind for printing
          if (runFinal) q.collect()
          val plan = q.queryExecution.executedPlan.toString
          val hits = plan.split("\n")
            .map(_.trim.replaceAll("^[:+\\- ]*", ""))
            .filter(l => interesting.exists(l.contains))
            .map(_.take(120))
          println(s"== $n")
          hits.foreach(l => println(s"   $l"))
        } catch { case e: Throwable => println(s"== $n  ERROR ${e.getMessage.take(80)}") }
      }
    }
    spark.stop()
  }
}
