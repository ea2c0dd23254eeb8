package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * plans/r<N>/. For lifecycle queries (which write layouts and return a
  * final probe frame) the dump is the RETURNED frame's plan; the
  * side-effecting build/advance plans are profiled via ProfileJobs.
  * Usage: tools/run.sh graft.PlanDump <outDir> <suffix> [queryName ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = args.headOption.getOrElse("plans/r21")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"== $n: no such query")
        case Some(fn) =>
          try {
            val q = fn(spark, dir)
            val formatted = q.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"), formatted)
            println(s"== $n -> $outDir/${n}_$suffix.txt")
            graft.pipeline.OperatorCache.releaseAll(spark)
            spark.sharedState.cacheManager.clearCache()
          } catch {
            case e: Throwable => println(s"== $n ERROR ${e.getMessage.take(120)}")
          }
      }
    }
    spark.stop()
  }
}
