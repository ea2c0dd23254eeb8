package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.BloomGate

/** The Bloom ingest gate must work UNCHANGED on a streaming frame:
  * probe is a map-only projection (bitmap literal + getbit conjunction,
  * no join, no state), which is exactly what makes it legal in a
  * streaming plan — and the property that lets one filter artifact
  * serve both the batch backfill and the live ingest path.
  */
class StreamingBloomGateSpec extends SparkSpec {
  import spark.implicits._

  test("probe filters a MemoryStream across micro-batches") {
    val seen = Seq(
      (1L, "the quick brown fox"),
      (2L, "an already ingested document")).toDF("id", "text")
    val bitmap = BloomGate.build(seen, "text", numBits = 1 << 12, k = 4)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val gated = BloomGate.probe(
      mem.toDF().toDF("id", "text"), "text", bitmap, 1 << 12, 4)
    val q = gated.writeStream.format("memory")
      .queryName("bloom_gate_out").outputMode("append").start()
    try {
      mem.addData((10L, "The QUICK brown fox!"), (11L, "fresh new content"))
      q.processAllAvailable()
      mem.addData((12L, "an already ingested document"), (13L, "more new text"))
      q.processAllAvailable()
      val out = spark.table("bloom_gate_out")
        .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
      assert(out === Map(10L -> true, 11L -> false, 12L -> true, 13L -> false))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS bloom_gate_out")
    }
  }
}
