package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cluster layout claim behind the incremental dedup family: a
  * band index persisted BUCKETED by (band, band_hash) is probed by
  * [[Dedup.incrementalCandidatesFrom]] with no exchange above the
  * index scan — the corpus-sized side never shuffles, however large
  * it grows; only the batch side repartitions into the bucket layout.
  * Proved here with broadcast disabled so the sort-merge plan (the
  * at-scale shape, where the batch is too big to broadcast) is what
  * gets asserted.
  */
class BucketedProbeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(ids: Range, salt: String) = ids.map(i =>
    (i.toLong, s"document number $i talks about $salt topic " +
      s"${i % 7} with some shared boilerplate text attached here"))
    .toDF("doc_id", "text")

  test("bucketed band index probes with no corpus-side exchange") {
    val prior = corpus(0 until 200, "alpha")
    val batch = corpus(1000 until 1040, "alpha")
    val index = Dedup.bandIndex(prior, "doc_id", "text")
    // a previous JVM's in-memory catalog forgets the table but leaves
    // its warehouse location — clear both so overwrite can create it
    spark.sql("DROP TABLE IF EXISTS graft_test_band_index")
    val loc = new java.io.File(
      "target/graft-tmp/warehouse/graft_test_band_index")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(loc)
    }
    Dedup.writeBandIndexBucketed(index, "graft_test_band_index", buckets = 8)
    val bucketed = spark.table("graft_test_band_index")

    val sh = Dedup.shingleRows(batch, "doc_id", "text", 3)
    val expected = Dedup.incrementalCandidatesFrom(index, sh, 32, 8)
      .as[(Long, Long)].collect().toSet

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val probed = Dedup.incrementalCandidatesFrom(bucketed, sh, 32, 8)
      assert(probed.as[(Long, Long)].collect().toSet == expected,
        "bucketed layout must return the identical candidate set")

      // plan shape: walk up from the bucketed relation scan — no
      // Exchange may sit between it and the join (the probe side keeps
      // its own exchange into the 8-bucket partitioning)
      val plan = probed.queryExecution.executedPlan.toString
      val joinChunk = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(joinChunk.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the index side is the FIRST child: between the join and the
      // bucketed FileScan there must be no Exchange (Sort is fine —
      // it is bucket-local)
      val indexSide = joinChunk.linesIterator
        .takeWhile(l => !l.contains("graft_test_band_index")).mkString("\n")
      assert(!indexSide.contains("Exchange hashpartitioning"),
        s"corpus-side exchange in the bucketed probe:\n$plan")
      assert(plan.contains("Exchange"),
        s"the batch side still shuffles into the bucket layout:\n$plan")
      // and the scan really is the bucketed table
      assert(plan.contains("graft_test_band_index"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_test_band_index")
      OperatorCache.releaseAll(spark)
    }
  }
}
