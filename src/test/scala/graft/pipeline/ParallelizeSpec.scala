package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contract for the narrow-input fan-out guard: it widens exactly the
  * case it exists for (a shuffle-free scan with fewer partitions than the
  * cluster), leaves everything else untouched, acts as an optimizer
  * barrier (the whole point — filters push through a bare Repartition),
  * and its cache obeys the OperatorCache release contract.
  */
class ParallelizeSpec extends SparkSpec {
  import spark.implicits._

  private def narrowScan() = {
    val dir = Files.createTempDirectory("parallelize-spec").toString
    (1 to 64).map(i => (i.toLong, s"text $i")).toDF("id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("widens a single-partition scan to cluster width") {
    spark.sharedState.cacheManager.clearCache()
    val wide = Parallelize.ensureWide(narrowScan())
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // results unchanged
    assert(wide.count() == 64)
    OperatorCache.releaseAll(spark)
  }

  test("widened frame is a pushdown barrier and tracked by OperatorCache") {
    spark.sharedState.cacheManager.clearCache()
    val wide = Parallelize.ensureWide(narrowScan())
    // persisted => tracked, and filters evaluate above the cache instead
    // of collapsing back into the narrow scan
    assert(OperatorCache.trackedCount(spark) >= 1)
    val filtered = wide.where(col("id") > 32)
    assert(filtered.count() == 32)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"expected the filter to scan the cached widened frame:\n$plan")
    OperatorCache.releaseAll(spark)
    assert(OperatorCache.trackedCount(spark) == 0)
  }

  test("no-op on plans containing a shuffle (never probes their RDD)") {
    val agg = narrowScan().groupBy("text").agg(count("*").as("c"))
    assert(Parallelize.ensureWide(agg) eq agg)
    val joined = narrowScan().as("a").join(narrowScan().as("b"), "id")
    assert(Parallelize.ensureWide(joined) eq joined)
  }

  test("no-op on inputs already at least cluster-wide") {
    val df = narrowScan().repartition(spark.sparkContext.defaultParallelism)
    // repartition IS a shuffle op — untouched via the plan check
    assert(Parallelize.ensureWide(df) eq df)
  }

  test("no-op on streaming plans") {
    val stream = spark.readStream.format("rate").load()
    assert(Parallelize.ensureWide(stream) eq stream)
  }
}
