package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.pipeline.{BloomGate, Dedup, TextAnalysis}

/** Scale proof for the sketch family (PLANS.md): replicate the sf0.1
  * documents table ×N with doc_id remapped and a per-copy token suffix
  * appended, so DISTINCT content grows ×N (the hard direction for
  * sketches — fresh docs, fresh vocabulary) while the sketch artifacts
  * stay parameter-sized:
  *
  *  - bloom: build = explode(k positions) + distinct + numBits-bounded
  *    collect; probe = map-only bitmap literal. Build time should grow
  *    ~linearly in rows; probe time likewise with NO shuffle — and the
  *    artifact is numBits/8 bytes at every N.
  *  - kmv: one stratum-keyed exchange whose rows are k-bounded sketch
  *    states, not distinct hashes (withExact=false — the production
  *    plan). Flat output size at every N.
  *  - cms: one global aggregate of depth×width counter tables,
  *    elementwise-add merge. Flat state at every N.
  *
  * The point to measure: sketch cost grows with DATA (one pass), never
  * with the DISTINCT-value count the sketch summarizes — the property
  * that makes them the 100 TB audit path where exact distinct/count
  * aggregates would shuffle corpus-sized state.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh \
  *   graft.SketchScaleBench [replicas] [--bloom|--kmv|--cms]
  */
object SketchScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(10)
    val modes = args.filter(_.startsWith("--")).map(_.drop(2)).toSet
    def on(m: String) = modes.isEmpty || modes.contains(m)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "24g")
      .appName("graft-sketch-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.ensureRegistered(spark)

    val docs = Tables.load(spark, sfDir, "documents")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1L
    // copy suffix makes every replica's text (and so its key, shingles,
    // and most tokens) DISTINCT — the sketch's worst case
    val scaled = docs
      .withColumn("copy", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("copy") * maxId).as("doc_id"),
        concat(col("text"), lit(" copymark"), col("copy")).as("text"),
        col("lang"))
      .persist()
    val nRows = scaled.count()

    def report(mode: String, sec: Double, extra: String = ""): Unit =
      println(s"""{"rows":$nRows,"replicas":$replicas,"mode":"$mode","sec":${f"$sec%.2f"}$extra}""")

    if (on("bloom")) {
      val t0 = System.nanoTime()
      val bitmap = BloomGate.build(scaled, "text", numBits = 1 << 22, k = 4)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val flagged = BloomGate.probe(scaled, "text", bitmap, 1 << 22, 4)
        .where(col("maybe_seen")).count()
      val tProbe = (System.nanoTime() - t1) / 1e9
      report("bloom_build", tBuild, s""","artifact_bytes":${bitmap.length * 8}""")
      report("bloom_probe", tProbe, s""","flagged":$flagged""")
    }
    if (on("kmv")) {
      val t0 = System.nanoTime()
      TextAnalysis.kmvVocabAudit(scaled, "lang", "text", k = 256,
        withExact = false)
        .write.format("noop").mode("overwrite").save()
      report("kmv", (System.nanoTime() - t0) / 1e9)
    }
    if (on("cms")) {
      val t0 = System.nanoTime()
      val toks = scaled.select(
        explode(Dedup.tokensOf(col("text"))).as("tok"))
      val pos = array(BloomGate.positions(col("tok"), 1 << 12, 4, "#cms"): _*)
      toks.select(pos.as("p"))
        .agg(GraftFunctions.cms(col("p"), 4, 1 << 12).as("s"))
        .write.format("noop").mode("overwrite").save()
      report("cms", (System.nanoTime() - t0) / 1e9)
    }
    spark.stop()
  }
}
