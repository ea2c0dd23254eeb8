package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Commit-protocol contracts for the executor-written shard sinks: no
  * in-progress temp ever survives a completed write, and a late commit
  * against an already-published file resolves instead of corrupting it.
  */
class ShardCommitSpec extends SparkSpec {
  import spark.implicits._

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def inprogress(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".inprogress")).toSeq

  test("commit publishes atomically; a second commit against a published file resolves") {
    val dir = s"target/graft-test/shardcommit_${System.nanoTime()}"
    new java.io.File(dir).mkdirs()
    val finalPath = new Path(dir, "shard-0")

    val first = new ShardCommit(hconf, finalPath)
    first.stream.write("payload".getBytes("UTF-8"))
    // nothing published while the attempt is in flight
    assert(!new java.io.File(dir, "shard-0").exists())
    assert(inprogress(dir).nonEmpty, "the attempt writes to a temp name")
    first.stream.close()
    first.commit()
    assert(new java.io.File(dir, "shard-0").exists())
    assert(inprogress(dir).isEmpty, "commit consumes the temp")

    // a straggler attempt (same deterministic bytes by contract) must
    // resolve cleanly — published file intact, no temp left behind
    val second = new ShardCommit(hconf, finalPath)
    second.stream.write("payload".getBytes("UTF-8"))
    second.stream.close()
    second.commit()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-0"))
    assert(new String(bytes, "UTF-8") == "payload")
    assert(inprogress(dir).isEmpty)
  }

  test("cleanup sweeps stray temps a killed attempt left behind") {
    val dir = s"target/graft-test/shardcommit_sweep_${System.nanoTime()}"
    new java.io.File(dir).mkdirs()
    val abandoned = new ShardCommit(hconf, new Path(dir, "shard-1"))
    abandoned.stream.write("half".getBytes("UTF-8"))
    abandoned.stream.close() // closed but never committed — a kill between
    assert(inprogress(dir).nonEmpty)
    ShardCommit.cleanup(hconf, dir)
    assert(inprogress(dir).isEmpty)
    assert(!new java.io.File(dir, "shard-1").exists(),
      "an uncommitted attempt must not publish")
  }

  test("every shard sink finishes with zero in-progress temps") {
    val docs = (1L to 30L).map(i => (i, s"doc $i")).toDF("id", "text")
    val base = s"target/graft-test/shardcommit_sinks_${System.nanoTime()}"

    Warc.writeShards(docs, "id", "text", s"$base/warc", shards = 3)
    Warc.writeWetShards(docs, "id", "text", s"$base/wet", shards = 3)
    Warc.writeShardsIndexed(docs, "id", "text", s"$base/idx", shards = 3)
    WebDataset.writeShards(docs, "id",
      Seq("txt" -> col("text")), s"$base/wds", shards = 3)

    for (sub <- Seq("warc", "wet", "idx", "wds"))
      assert(inprogress(s"$base/$sub").isEmpty, s"$sub left temps behind")
    // and the published layouts actually read back
    assert(Warc.read(spark, s"$base/warc")
      .where(col("warc_type") === "response").count() == 30)
    assert(Warc.fetch(spark, s"$base/idx",
      Seq(Tuple1("7")).toDF("id")).count() == 1)
  }
}
