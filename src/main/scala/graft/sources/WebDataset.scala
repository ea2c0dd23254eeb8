package graft.sources

import java.io.{ByteArrayInputStream, IOException, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** One assembled WebDataset sample ([[WebDataset.readSamplesLocal]]):
  * the key plus an ext -> payload map. Top-level and public — encoder
  * deserializers are code-generated, and Janino cannot construct a
  * private nested class (a private SampleRow broke the p118 publish
  * under Verify while interpreted fallback hid it in the test JVM).
  */
final case class WdSample(key: String, parts: Map[String, Array[Byte]])

/** WebDataset-style tar shards — the sample-per-basename tar layout
  * multimodal training loaders stream (a shard is a POSIX ustar archive;
  * a SAMPLE is every member sharing a basename: `1234.txt`, `1234.json`,
  * `1234.jpg`, ...). The ustar format is a public fixed 512-byte-header
  * grammar the JDK doesn't wrap but ~80 lines implement exactly.
  *
  * Read path mirrors [[Warc]]: `binaryFile` scan, the FILE is the
  * parallelism unit (training shards are sized ~100 MB–1 GiB for
  * exactly this reason — sequential tar streaming per worker), one
  * member-walk per shard, no shuffle until the caller groups samples.
  * Damage tolerance: a truncated or corrupt shard yields its complete
  * members and stops (checksum-failing headers end the walk — resync
  * inside a tar stream is guesswork; archives, unlike WARC, have no
  * record magic to resync onto).
  *
  * Write path: rows hash-partition by key into `shards` files written
  * from the executors; members emit in sorted-key order with zeroed
  * mtime/uid/gid, so a shard is a bit-reproducible function of its
  * row set.
  */
object WebDataset {

  /** One tar member. `key` is the basename before the FIRST dot, `ext`
    * everything after it — WebDataset's sample-grouping convention
    * (so `x.seg.png` has ext `seg.png`). */
  final case class Member(
      path: String, key: String, ext: String, payload: Array[Byte])

  private val BlockSize = 512
  /** Sanity cap on one member (1 GiB) — a corrupt size field must end
    * the walk, not the executor's heap. */
  private val MaxMemberBytes = 1L << 30

  // --- read ---------------------------------------------------------

  /** Scan `.tar` / `.tar.gz` shards into (path, key, ext, payload) —
    * one row per member. Group by (path-independent) key downstream to
    * assemble samples; [[readSamples]] does the common text+json case.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    implicit val enc: Encoder[Member] = Encoders.product[Member]
    files.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) => parseShard(p, bytes) }
      .toDF()
  }

  /** Streaming [[read]]: watch `dir` for NEW tar shards (Structured
    * Streaming's file source tracks arrivals), one member row per tar
    * entry per micro-batch — the multimodal sibling of
    * [[Warc.readStream]], and the front door of the streaming ingest
    * gate ([[graft.streaming.StreamingMultimodal]]). The shard file is
    * the unit of both storage and progress.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "path string, modificationTime timestamp, length long, content binary")
    val files = spark.readStream.format("binaryFile").schema(schema).load(dir)
      .select(col("path"), col("content"))
    implicit val enc: Encoder[Member] = Encoders.product[Member]
    files.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) => parseShard(p, bytes) }
      .toDF()
  }

  /** [[read]] + sample assembly: one row per key with a `parts` map of
    * ext → payload. One groupBy on the key — the only shuffle, and the
    * natural one (samples must meet somewhere). */
  def readSamples(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .groupBy("key")
      .agg(map_from_entries(collect_list(struct(col("ext"), col("payload"))))
        .as("parts"))

  /** ZERO-SHUFFLE sample assembly: one row per key with one binary
    * column per ext in `exts` (null when the sample lacks that part),
    * assembled by grouping ADJACENT members inside each tar walk — the
    * WebDataset convention guarantees a sample's members are contiguous
    * within a shard (our own [[writeShards]] emits them key-sorted).
    *
    * This is the at-scale publish shape: where [[readSamples]] pays a
    * payload-bytes exchange to meet a sample's parts, this pays none —
    * the assembled row leaves the scan, so a downstream re-shard or
    * key join is the ONLY exchange that ever carries asset bytes.
    * Contract: a key split across shards (or non-contiguous inside one)
    * yields one row per contiguous run, not a merged sample — callers
    * needing to tolerate that layout should use [[readSamples]].
    */
  def readSamplesLocal(
      spark: SparkSession, path: String, exts: Seq[String]): DataFrame = {
    require(exts.nonEmpty, "readSamplesLocal needs at least one ext")
    val keep = exts.toSet
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    implicit val enc: Encoder[WdSample] = Encoders.product[WdSample]
    files.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (p, bytes) =>
        val ms = parseShard(p, bytes).filter(m => keep(m.ext)).buffered
        new Iterator[WdSample] {
          override def hasNext: Boolean = ms.hasNext
          override def next(): WdSample = {
            val k = ms.head.key
            val b = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
            while (ms.hasNext && ms.head.key == k) {
              val m = ms.next(); b(m.ext) = m.payload
            }
            WdSample(k, b.toMap)
          }
        }
      }
      .toDF()
      .select(col("key") +: exts.map(e => col("parts").getItem(e).as(e)): _*)
  }

  /** Walk one shard's members (gzip auto-detected). Never throws. */
  def parseShard(path: String, bytes: Array[Byte]): Iterator[Member] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        new java.io.BufferedInputStream(new GZIPInputStream(raw, 64 * 1024), 64 * 1024)
      else raw
    new Iterator[Member] {
      private var nextM: Member = fetch()
      override def hasNext: Boolean = nextM != null
      override def next(): Member = { val m = nextM; nextM = fetch(); m }
      private def fetch(): Member =
        try {
          while (true) {
            val hdr = new Array[Byte](BlockSize)
            if (!fill(in, hdr)) return null
            if (hdr.forall(_ == 0)) return null // end-of-archive zero block
            if (!checksumOk(hdr)) return null   // damaged header: stop
            val name = cstr(hdr, 0, 100)
            val size = octal(hdr, 124, 12)
            if (size < 0 || size > MaxMemberBytes) return null
            val data = new Array[Byte](size.toInt)
            if (!fill(in, data)) return null    // truncated member
            val pad = (BlockSize - (size % BlockSize)) % BlockSize
            if (pad > 0 && in.skipNBytes0(pad.toInt) < pad) return null
            val typeflag = hdr(156).toChar
            if (typeflag == '0' || typeflag == 0.toChar) {
              val base = name.substring(name.lastIndexOf('/') + 1)
              val dot = base.indexOf('.')
              val (key, ext) =
                if (dot < 0) (base, "") else (base.substring(0, dot), base.substring(dot + 1))
              return Member(path, key, ext, data)
            }
            // directories/links/extension headers: skip the member, walk on
          }
          null
        } catch { case _: IOException => null }
    }
  }

  /** skipNBytes that reports a short skip instead of throwing. */
  private implicit class SkipOps(val in: InputStream) extends AnyVal {
    def skipNBytes0(n: Int): Int = {
      var done = 0
      while (done < n) {
        val r = in.read() // tar pads are tiny; byte reads keep this simple
        if (r < 0) return done
        done += 1
      }
      done
    }
  }

  private def fill(in: InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) return false
      off += r
    }
    true
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  /** Parse a NUL/space-terminated octal field; -1 when malformed. */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = off; var seen = false
    while (i < off + len && (b(i) == ' ' && !seen)) i += 1
    while (i < off + len && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; seen = true
    }
    if (seen) v else -1L
  }

  private def checksumOk(hdr: Array[Byte]): Boolean = {
    val stored = octal(hdr, 148, 8)
    if (stored < 0) return false
    var sum = 0L
    var i = 0
    while (i < BlockSize) {
      sum += (if (i >= 148 && i < 156) ' '.toInt else hdr(i) & 0xff)
      i += 1
    }
    sum == stored
  }

  // --- write --------------------------------------------------------

  /** Write one sample per row: for each `(ext, column)` part a member
    * `<key>.<ext>` holding the column's bytes (binary or string columns;
    * null parts are skipped — a sample missing a modality just lacks
    * that file, the WebDataset convention). Rows hash-partition by key
    * into `shards` tars; within a shard, members emit in sorted key
    * order with zeroed metadata → bit-reproducible shards.
    */
  /** @param preShuffled the caller already partitioned `df` so that all
    *                     rows of a key share a partition (a
    *                     `repartition(n, key)` or a key-equi-join over
    *                     one) — skip this writer's own repartition and
    *                     emit one shard PER INPUT PARTITION (`shards` is
    *                     ignored). This is how a publish pipeline keeps
    *                     payload bytes to ONE exchange end-to-end: the
    *                     upstream exchange does double duty as the
    *                     shard layout.
    */
  def writeShards(
      df: DataFrame, keyCol: String, parts: Seq[(String, Column)],
      dir: String, shards: Int, gzip: Boolean = false,
      preShuffled: Boolean = false,
  ): Unit = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    require(parts.nonEmpty, "writeShards needs at least one part")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs0 = target.getFileSystem(hconf.value)
    fs0.delete(target, true)
    fs0.mkdirs(target)
    val exts = parts.map(_._1)
    val cols = col(keyCol).cast("string").as("__key") +:
      parts.map { case (e, c) => c.cast("binary").as(s"__p_$e") }
    val ext = if (gzip) "tar.gz" else "tar"
    val projected = df.select(cols: _*)
    val placed =
      if (preShuffled) projected
      else projected.repartition(shards, col("__key"))
    placed
      .sortWithinPartitions("__key")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = TaskContext.getPartitionId()
        val file = new org.apache.hadoop.fs.Path(dir, f"shard-$pid%05d.$ext")
        val committer = new ShardCommit(hconf.value, file)
        val out: OutputStream =
          if (gzip) new GZIPOutputStream(committer.stream, 64 * 1024)
          else committer.stream
        try {
          it.foreach { r =>
            val key = r.getString(0)
            exts.zipWithIndex.foreach { case (e, i) =>
              if (!r.isNullAt(i + 1))
                writeMember(out, s"$key.$e", r.getAs[Array[Byte]](i + 1))
            }
          }
          out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
        } finally out.close()
        committer.commit()
      }
    ShardCommit.cleanup(hconf.value, dir)
  }

  private def writeMember(out: OutputStream, name: String, data: Array[Byte]): Unit = {
    val nameBytes = name.getBytes("UTF-8")
    require(nameBytes.length <= 100, s"member name too long for ustar: $name")
    val hdr = new Array[Byte](BlockSize)
    System.arraycopy(nameBytes, 0, hdr, 0, nameBytes.length)
    putOctal(hdr, 100, 8, 420)        // mode 0644
    putOctal(hdr, 108, 8, 0)          // uid
    putOctal(hdr, 116, 8, 0)          // gid
    putOctal(hdr, 124, 12, data.length.toLong)
    putOctal(hdr, 136, 12, 0)         // mtime: zeroed for reproducibility
    hdr(156) = '0'                    // regular file
    System.arraycopy("ustar".getBytes("UTF-8"), 0, hdr, 257, 5)
    hdr(263) = '0'; hdr(264) = '0'    // version "00"
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    hdr.foreach(b => sum += (b & 0xff))
    val chk = "%06o".format(sum).getBytes("UTF-8")
    System.arraycopy(chk, 0, hdr, 148, 6)
    hdr(154) = 0; hdr(155) = ' ' // conventional NUL+space terminator
    out.write(hdr)
    out.write(data)
    val pad = (BlockSize - (data.length % BlockSize)) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def putOctal(b: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (len - 1 - s.length)) + s
    System.arraycopy(padded.getBytes("UTF-8"), 0, b, off, len - 1)
    b(off + len - 1) = 0
  }
}
