package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WebDataset tar-shard contracts: ustar framing (validated against the
  * system `tar`), sample assembly, damage tolerance, reproducibility.
  */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 30L)
    .map(i => (i, s"text body $i", s"""{"lang":"en","n":$i}"""))
    .toDF("id", "text", "meta")

  private def freshDir(tag: String) =
    s"target/graft-test/wds_${tag}_${System.nanoTime()}"

  test("writeShards → read round trip; keys, exts, payloads exact") {
    val dir = freshDir("rt")
    WebDataset.writeShards(docs, "id",
      Seq("txt" -> col("text"), "json" -> col("meta")), dir, shards = 3)
    val back = WebDataset.read(spark, dir)
      .select(col("key").cast("long"), col("ext"),
        decode(col("payload"), "UTF-8"))
      .as[(Long, String, String)].collect()
    assert(back.length == 60, "30 samples x 2 parts")
    back.foreach { case (id, ext, body) =>
      if (ext == "txt") assert(body == s"text body $id")
      else { assert(ext == "json"); assert(body == s"""{"lang":"en","n":$id}""") }
    }
    // sample assembly: one row per key, parts keyed by ext
    val samples = WebDataset.readSamples(spark, dir)
      .select(col("key").cast("long"),
        decode(element_at(col("parts"), "txt"), "UTF-8"))
      .as[(Long, String)].collect().toMap
    assert(samples.size == 30 && samples(7L) == "text body 7")
  }

  test("shards are real ustar: the system tar lists and extracts them") {
    val dir = freshDir("tar")
    WebDataset.writeShards(docs, "id", Seq("txt" -> col("text")), dir, shards = 1)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    def run(cmd: String*): String = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
      out
    }
    val names = run("tar", "-tf", shard.getPath).linesIterator.toSeq
    assert(names.length == 30 && names.forall(_.matches("\\d+\\.txt")),
      s"unexpected member list: ${names.take(3)}")
    assert(run("tar", "-xOf", shard.getPath, "12.txt") == "text body 12")
  }

  test("damage tolerance: truncation, bad checksum, corrupt size never throw") {
    val dir = freshDir("dmg")
    WebDataset.writeShards(docs, "id", Seq("txt" -> col("text")), dir, shards = 1)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    val whole = WebDataset.parseShard("s", bytes).size
    assert(whole == 30)
    // truncated mid-member: complete prior members survive
    val cut = WebDataset.parseShard("t", bytes.take(bytes.length / 2)).size
    assert(cut > 0 && cut < 30)
    // flip a byte inside the THIRD header (checksum breaks → walk stops there)
    val third = bytes.clone()
    third(2 * 1024 + 3) = 'Z'.toByte // each member = 512 hdr + 512-padded body
    val upTo = WebDataset.parseShard("c", third).size
    assert(upTo < 30, "a checksum-failing header must end the walk")
    // byte-flip fuzz across the shard: never throws
    (0 until bytes.length by 97).foreach { i =>
      val f = bytes.clone(); f(i) = (f(i) ^ 0x41).toByte
      WebDataset.parseShard("z", f).foreach(_ => ())
    }
    assert(WebDataset.parseShard("e", Array.emptyByteArray).isEmpty)
  }

  test("gzip shards round trip; null parts skipped; bit-reproducible") {
    val dir = freshDir("gz")
    val withNulls = docs.withColumn("meta",
      when(col("id") % 3 === 0, col("meta"))) // 2/3 of samples lack json
    WebDataset.writeShards(withNulls, "id",
      Seq("txt" -> col("text"), "json" -> col("meta")), dir,
      shards = 2, gzip = true)
    val back = WebDataset.read(spark, dir)
    assert(back.where(col("ext") === "txt").count() == 30)
    assert(back.where(col("ext") === "json").count() == 10,
      "null parts must be skipped, not written empty")
    val dir2 = freshDir("gz2")
    WebDataset.writeShards(withNulls, "id",
      Seq("txt" -> col("text"), "json" -> col("meta")), dir2,
      shards = 2, gzip = true)
    val f1 = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar.gz"))
      .sortBy(_.getName).map(f => java.nio.file.Files.readAllBytes(f.toPath))
    val f2 = new java.io.File(dir2).listFiles().filter(_.getName.endsWith(".tar.gz"))
      .sortBy(_.getName).map(f => java.nio.file.Files.readAllBytes(f.toPath))
    assert(f1.length == f2.length &&
      f1.zip(f2).forall { case (a, b) => java.util.Arrays.equals(a, b) },
      "writeShards must be bit-reproducible")
  }
}
