package graft.sources

import java.io.IOException

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.spark.TaskContext

/** Task-commit protocol for executor-written shard files.
  *
  * The shard writers ([[Warc.writeShards]], [[Warc.writeWetShards]],
  * [[Warc.writeShardsIndexed]], [[WebDataset.writeShards]]) create their
  * final files from inside `foreachPartition`/`mapPartitions`, outside
  * Spark's FileFormatWriter commit path. A bare `fs.create(file,
  * overwrite = true)` there is unsafe under task retry or speculative
  * execution: two attempts of the same partition can interleave writes
  * into the same final file, and a reader can observe a torn shard.
  *
  * This helper restores the two invariants Spark's own committer gives:
  *
  *   1. '''Attempt isolation''' — each attempt writes to its own temp
  *      name (`.<final>.<taskAttemptId>.inprogress`), so concurrent
  *      attempts never touch the same bytes.
  *   2. '''Atomic publish''' — the temp is renamed over the final name
  *      only after a successful close. Rename is atomic on HDFS and on
  *      POSIX local filesystems. If another attempt already published
  *      (HDFS rename refuses when the destination exists), this
  *      attempt's temp is discarded — safe because every caller makes
  *      the shard bytes a DETERMINISTIC function of the partition's
  *      rows (`sortWithinPartitions` before the write, content-derived
  *      record ids), so either attempt's bytes are identical.
  *
  * The determinism requirement is load-bearing for
  * [[Warc.writeShardsIndexed]] in particular: its `_index` rows travel
  * through Spark's shuffle/parquet commit independently of the shard
  * bytes, so the surviving index may come from a different attempt than
  * the surviving shard — byte offsets only line up if every attempt
  * writes identical bytes.
  *
  * A task-failure listener removes the attempt's temp on failure;
  * [[cleanup]] (driver-side, after the action) sweeps any stragglers a
  * killed executor left behind.
  */
final class ShardCommit(conf: Configuration, finalPath: Path) {
  private val fs = finalPath.getFileSystem(conf)
  private val attemptId = {
    val tc = TaskContext.get()
    if (tc != null) tc.taskAttemptId() else 0L
  }
  private val tmp = new Path(
    finalPath.getParent, s".${finalPath.getName}.$attemptId${ShardCommit.Suffix}")

  {
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskFailureListener { (_, _) =>
      try fs.delete(tmp, false) catch { case _: IOException => () }
      ()
    }
  }

  /** The attempt-private stream. Close it, then call [[commit]]. */
  val stream: FSDataOutputStream = fs.create(tmp, true)

  /** Publish the closed temp file under the final name. Call exactly
    * once, after `stream` (and any wrappers) are closed.
    */
  def commit(): Unit = {
    if (!fs.rename(tmp, finalPath)) {
      // HDFS rename returns false when the destination exists — an
      // earlier attempt of this partition already published identical
      // bytes (see class doc). Anything else is a real failure.
      if (!fs.exists(finalPath))
        throw new IOException(s"ShardCommit: rename $tmp -> $finalPath failed " +
          "and no committed file exists")
      fs.delete(tmp, false)
    }
  }
}

object ShardCommit {
  private[sources] val Suffix = ".inprogress"

  /** Driver-side sweep: remove any `.inprogress` temp files that failed
    * or killed attempts left under `dir`. Call after the writing action
    * completes.
    */
  def cleanup(conf: Configuration, dir: String): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) {
      fs.listStatus(d).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(Suffix))
          fs.delete(st.getPath, false)
      }
    }
  }
}
