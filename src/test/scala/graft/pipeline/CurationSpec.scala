package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the curation operators: sampling must be reproducible
  * and rate-accurate, packing must honor its bounded-overflow guarantee
  * and lose no documents.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 2000L).map(i =>
    (i, if (i % 4 == 0) "en" else "de", 10 + (i % 90))).toDF("id", "lang", "toks")

  test("deterministicSample: same ids every run, rate within tolerance") {
    val a = Curation.deterministicSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Curation.deterministicSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    assert(a == b, "selection must be identical across runs")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate off: ${a.size}/2000")
    // a larger fraction strictly extends the smaller one (gate monotone)
    val c = Curation.deterministicSample(docs, "id", 0.6).select("id").as[Long].collect().toSet
    assert(a.subsetOf(c), "fractions must nest: the 30% sample is inside the 60% one")
  }

  test("stratifiedSample applies per-stratum rates") {
    val kept = Curation.stratifiedSample(docs, "id", "lang",
      Map("en" -> 0.8), defaultFraction = 0.1)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 en docs at 80%, 1500 de docs at 10%
    assert(math.abs(byLang("en") / 500.0 - 0.8) < 0.1, s"en rate: ${byLang("en")}/500")
    assert(math.abs(byLang("de") / 1500.0 - 0.1) < 0.05, s"de rate: ${byLang("de")}/1500")
  }

  test("packSequences: every doc packed once, bounded overflow, fill efficiency") {
    val budget = 256L
    val packed = Curation.packSequences(docs, "id", "toks", budget, shards = 4)
    assert(packed.count() == 2000, "no doc may be lost or duplicated")

    val packs = packed.groupBy("shard", "pack")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"),
        count("*").as("n"))
      .collect()
    packs.foreach { r =>
      val (total, biggest) = (r.getAs[Long]("total"), r.getAs[Long]("biggest"))
      assert(total < budget + biggest,
        s"pack ${r.get(0)}/${r.get(1)} overflows beyond its largest doc: $total")
    }
    // fill efficiency: a non-final pack's prefix range is budget wide,
    // and only the previous pack's straddling doc can eat into it — so
    // its total exceeds budget minus the shard's largest doc
    val lastPacks = packs.map(r => (r.getAs[Int]("shard"), r.getAs[Long]("pack")))
      .groupBy(_._1).map { case (s, ps) => s -> ps.map(_._2).max }
    val shardMax = packed.groupBy("shard").agg(max("n_tokens").as("m"))
      .collect().map(r => r.getAs[Int]("shard") -> r.getAs[Long]("m")).toMap
    packs.foreach { r =>
      val (shard, pack) = (r.getAs[Int]("shard"), r.getAs[Long]("pack"))
      if (pack != lastPacks(shard))
        assert(r.getAs[Long]("total") > budget - shardMax(shard),
          s"non-final pack $shard/$pack underfilled: ${r.getAs[Long]("total")}")
    }
  }

  test("packSequences: a doc longer than the budget gets a pack of its own") {
    val mixed = Seq((1L, 1000L), (2L, 10L), (3L, 10L)).toDF("id", "toks")
    val packed = Curation.packSequences(mixed, "id", "toks", budgetTokens = 256L,
      shards = 1)
    val giant = packed.where(col("id") === 1L).select("pack").as[Long].head()
    val sharers = packed.where(col("pack") === giant).count()
    assert(sharers == 1, "an over-budget doc must not share its pack")
  }

  test("packRelated: packs never cross cells; in-cell packing matches the cum rule") {
    // cells: id % 3; token counts vary by id so packs split mid-cell
    val toks = (0L until 300L).map(i => (i, 20L + i % 50)).toDF("id", "toks")
    val cells = (0L until 300L).map(i => (i, (i % 3).toInt)).toDF("cid", "cell")
    val packed = Curation.packRelated(toks, "id", "toks",
      cells, "cid", "cell", budgetTokens = 256L, subshards = 2)
    assert(packed.count() == 300, "no doc lost or duplicated")
    // bounded overflow: a pack never exceeds budget + its largest doc
    packed.groupBy("cell", "subshard", "pack")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("total") < 256L + r.getAs[Long]("biggest"),
          s"overflowing pack: $r")
      }
    // the packing rule per (cell, subshard) is the same greedy cum rule
    // packSequences uses, in (gate, id) order — replay it driver-side
    def gateOf(id: Long) = ((id % 100000L + 1L) * 2654435761L) % 1000000L
    val rows = packed.select("id", "cell", "subshard", "n_tokens", "pack")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, grp) =>
      var cum = 0L
      grp.sortBy(r => (gateOf(r._1), r._1)).foreach { case (id, _, _, n, pack) =>
        assert(pack == cum / 256L, s"doc $id: pack $pack != ${cum / 256L}")
        cum += n
      }
    }
    // null/negative token counts raise, same contract as packSequences
    val bad = Seq((1L, null.asInstanceOf[java.lang.Long])).toDF("id", "toks")
    intercept[Exception] {
      Curation.packRelated(bad, "id", "toks",
        Seq((1L, 0)).toDF("cid", "cell"), "cid", "cell", 256L).collect()
    }
  }

  test("materializePacks: fill-order concat, boundary offsets, both packers") {
    val toks = Seq(
      (1L, Seq("a", "b", "c")),   // 3 tokens
      (2L, Seq("d", "e")),        // 2
      (3L, Seq("f", "g", "h", "i")), // 4
      (4L, Seq("j")),             // 1
    ).toDF("id", "toks").withColumn("n", size(col("toks")).cast("long"))
    // one shard, budget 5: fill order (n desc, id asc) = 3,1,2,4 →
    // cum-before 0,4,7,9 → packs 0,0,1,1
    val packed = Curation.packSequences(toks, "id", "n", budgetTokens = 5L,
      shards = 1)
    val mat = Curation.materializePacks(packed, Seq("shard"), "id", "toks",
      longestFirst = true)
      .orderBy("pack").collect()
    assert(mat.length == 2)
    def seqOf[T](r: org.apache.spark.sql.Row, c: String): Seq[T] =
      r.getSeq[T](r.fieldIndex(c)).toList
    val p0 = mat(0)
    assert(seqOf[Long](p0, "docs") == Seq(3L, 1L))
    assert(seqOf[String](p0, "token_ids") ==
      Seq("f", "g", "h", "i", "a", "b", "c"))
    assert(seqOf[Long](p0, "doc_boundaries") == Seq(0L, 4L, 7L),
      "n_docs+1 offsets: 0, after doc 3, total")
    assert(p0.getAs[Long]("n_docs") == 2L && p0.getAs[Long]("n_tokens") == 7L)
    val p1 = mat(1)
    assert(seqOf[Long](p1, "docs") == Seq(2L, 4L))
    assert(seqOf[String](p1, "token_ids") == Seq("d", "e", "j"))
    assert(seqOf[Long](p1, "doc_boundaries") == Seq(0L, 2L, 3L))

    // packRelated path: (gate, id) order within (cell, subshard) —
    // gates for ids 1..4 (salt 1): 871522, 307283, 743044, 178805,
    // so the fill order is 4, 2, 3, 1
    val cells = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0)).toDF("cid", "cell")
    val rel = Curation.packRelated(toks, "id", "n", cells, "cid", "cell",
      budgetTokens = 100L)
    val rmat = Curation.materializePacks(rel, Seq("cell", "subshard"), "id",
      "toks", orderCol = Some("gate")).collect()
    assert(rmat.length == 1)
    assert(seqOf[Long](rmat(0), "docs") == Seq(4L, 2L, 3L, 1L),
      "packRelated materializes in its (gate, id) fill order")
    assert(seqOf[String](rmat(0), "token_ids") ==
      Seq("j", "d", "e", "f", "g", "h", "i", "a", "b", "c"))
  }

  test("chunkDocuments: sliding windows cover every token with the declared overlap") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val doc = Seq((7L, text)).toDF("doc_id", "text")

    // stride == chunk (no overlap): concatenating chunks rebuilds the doc
    val flat = Curation.chunkDocuments(doc, "doc_id", "text", 16)
      .orderBy("chunk_idx").collect()
    assert(flat.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2))
    assert(flat.map(_.getAs[Long]("n_tokens")).toSeq == Seq(16L, 16L, 8L))
    assert(flat.map(_.getAs[String]("chunk_text")).mkString(" ") == text)

    // stride 8 (50% overlap): starts at 0,8,…,32; window i shares its
    // first 8 tokens with window i-1's last 8
    val over = Curation.chunkDocuments(doc, "doc_id", "text", 16, 8)
      .orderBy("chunk_idx").collect()
    assert(over.length == 5)
    val texts = over.map(_.getAs[String]("chunk_text"))
    for (i <- 1 until texts.length) {
      val prev = texts(i - 1).split(" ")
      val cur = texts(i).split(" ")
      assert(prev.drop(8).sameElements(cur.take(prev.length - 8)),
        s"window $i does not overlap window ${i - 1} by stride")
    }
    // last chunk is the short tail, not a silent drop
    assert(over.last.getAs[Long]("n_tokens") == 8L)

    intercept[IllegalArgumentException](
      Curation.chunkDocuments(doc, "doc_id", "text", 8, 9))
  }

  test("chunkBySentences: never cuts a sentence; floor rule; oversized sentence intact") {
    val text = "One two three. Four five six seven! Eight nine? " +
      "Ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen. Tail end."
    val doc = Seq((7L, text)).toDF("doc_id", "text")
    val rows = Curation.chunkBySentences(doc, "doc_id", "text", maxTokens = 6)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk_text"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_tokens")))
    // sentence token counts: 3, 4, 2, 9, 2; exclusive cums 0,3,7,9,18 →
    // chunks ⌊cum/6⌋ = 0,0,1,1,3 — a chunk may overflow by its last
    // sentence (chunk 0 holds 7 tokens) and the 9-token sentence lands
    // whole in chunk 1 rather than splitting
    assert(rows.map(_._1).toSeq == Seq(0, 1, 3), s"chunk ids: ${rows.toSeq}")
    assert(rows(0)._2 == "One two three. Four five six seven!" &&
      rows(0)._3 == 2L && rows(0)._4 == 7L)
    assert(rows(1)._2 == "Eight nine? Ten eleven twelve thirteen fourteen " +
      "fifteen sixteen seventeen eighteen." && rows(1)._4 == 11L)
    assert(rows(2)._2 == "Tail end." && rows(2)._4 == 2L)
    // reassembling chunks in order rebuilds the document
    assert(rows.map(_._2).mkString(" ") == text)
    // empty docs yield no chunks; punctuation-free text is one sentence
    assert(Curation.chunkBySentences(
      Seq((1L, ""), (2L, "no terminal punctuation here")).toDF("doc_id", "text"),
      "doc_id", "text", 6).collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[IllegalArgumentException](
      Curation.chunkBySentences(doc, "doc_id", "text", 0))
  }

  test("sampleByTokenBudget: fills per-stratum token budgets deterministically, bounded overflow") {
    // 2000 docs over en/de with 10..99 tokens each (from the shared fixture)
    val kept = Curation.sampleByTokenBudget(docs, "id", "toks", "lang",
      budgets = Map("en" -> 2000L), defaultBudget = 500L)
    val byLang = kept.groupBy("lang")
      .agg(sum(col("toks")).as("total"), max("toks").as("biggest"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // budget filled: total within [budget, budget + biggest) per stratum
    val (enTotal, enBig) = byLang("en")
    assert(enTotal >= 2000L && enTotal < 2000L + enBig, s"en total $enTotal")
    val (deTotal, deBig) = byLang("de")
    assert(deTotal >= 500L && deTotal < 500L + deBig, s"de total $deTotal")
    // deterministic: identical selection across runs
    val a = kept.select("id").as[Long].collect().sorted.toSeq
    val b = Curation.sampleByTokenBudget(docs, "id", "toks", "lang",
      budgets = Map("en" -> 2000L), defaultBudget = 500L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // zero budget takes nothing
    assert(Curation.sampleByTokenBudget(docs, "id", "toks", "lang",
      budgets = Map.empty, defaultBudget = 0L).count() == 0)
    // null token counts raise (same contract as packSequences)
    val withNull = Seq((1L, "en", Some(10L)), (2L, "en", None))
      .toDF("id", "lang", "toks")
    val e = intercept[Exception](
      Curation.sampleByTokenBudget(withNull, "id", "toks", "lang",
        Map("en" -> 100L)).collect())
    assert(e.getMessage.contains("non-negative"))
  }

  test("epochMixture: whole epochs + fractional top-up meet targets above availability") {
    // en avail = sum over 500 docs; ask for ~2.5 epochs of en and a
    // sub-epoch slice of de
    val avail = docs.groupBy("lang").agg(sum(col("toks")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enTarget = avail("en") * 5 / 2
    val deTarget = avail("de") / 3
    val out = Curation.epochMixture(docs, "id", "toks", "lang",
      targets = Map("en" -> enTarget, "de" -> deTarget))
    val rows = out.select("id", "lang", "toks", "repeat_count")
      .as[(Long, String, Long, Long)].collect()

    // en: every doc carries the 2 whole epochs; top-up docs carry 3
    val en = rows.filter(_._2 == "en")
    assert(en.length == 500, "whole-domain epochs keep every doc")
    assert(en.forall(r => r._4 == 2L || r._4 == 3L))
    // delivered tokens land in [target, target + biggest straddler)
    val enDelivered = en.map(r => r._3 * r._4).sum
    val enBig = en.map(_._3).max
    assert(enDelivered >= enTarget && enDelivered < enTarget + enBig,
      s"en delivered $enDelivered vs target $enTarget")

    // de: sub-epoch target ⇒ pure frontier selection, repeat_count 1,
    // and it matches sampleByTokenBudget's selection exactly (same
    // gate salt ⇒ same frontier)
    val de = rows.filter(_._2 == "de")
    assert(de.forall(_._4 == 1L))
    val deDelivered = de.map(r => r._3 * r._4).sum
    val deBig = de.map(_._3).max
    assert(deDelivered >= deTarget && deDelivered < deTarget + deBig)
    val frontier = Curation.sampleByTokenBudget(docs.where(col("lang") === "de"),
      "id", "toks", "lang", budgets = Map("de" -> deTarget), salt = 6)
      .select("id").as[Long].collect().sorted.toSeq
    assert(de.map(_._1).sorted.toSeq == frontier)

    // unlisted domain (default 0) yields nothing; determinism across
    // partitionings
    assert(out.where(col("repeat_count") <= 0).count() == 0)
    val repart = Curation.epochMixture(docs.repartition(13), "id", "toks",
      "lang", targets = Map("en" -> enTarget, "de" -> deTarget))
      .select("id", "repeat_count").as[(Long, Long)].collect().sorted.toSeq
    assert(repart == rows.map(r => (r._1, r._4)).sorted.toSeq)

    // null token counts raise (shared contract)
    val withNull = Seq((1L, "en", Some(10L)), (2L, "en", None))
      .toDF("id", "lang", "toks")
    val e = intercept[Exception](
      Curation.epochMixture(withNull, "id", "toks", "lang",
        Map("en" -> 100L)).collect())
    assert(e.getMessage.contains("non-negative"))
  }

  test("packSequences: null or negative token counts raise instead of corrupting the fill") {
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("id", "toks")
    val e1 = intercept[Exception](
      Curation.packSequences(withNull, "id", "toks", budgetTokens = 64L, shards = 1)
        .collect())
    assert(e1.getMessage.contains("non-negative"), s"got: ${e1.getMessage}")

    val withNeg = Seq((1L, 10L), (2L, -1L)).toDF("id", "toks")
    val e2 = intercept[Exception](
      Curation.packSequences(withNeg, "id", "toks", budgetTokens = 64L, shards = 1)
        .collect())
    assert(e2.getMessage.contains("non-negative"), s"got: ${e2.getMessage}")
  }

  test("packSequences: a custom gate balances sparse 64-bit ids across shards") {
    // ids that all collide mod 1e5 — the worst case for the default
    // dense-id gate (xxhash64-derived ids hit this in miniature): every
    // doc lands on ONE shard
    val sparse = (1L to 512L).map(i => (i * 100000L, 10L + i % 90))
      .toDF("id", "toks")
    val defaulted = Curation.packSequences(sparse, "id", "toks",
      budgetTokens = 256L, shards = 16)
    assert(defaulted.select("shard").distinct().count() == 1,
      "collide-mod-1e5 ids must expose the default gate's collapse")

    // the documented escape hatch: shard by a real hash of the id
    val gated = Curation.packSequences(sparse, "id", "toks",
      budgetTokens = 256L, shards = 16, gate = xxhash64(col("id")))
    val counts = gated.groupBy("shard").count()
      .collect().map(r => r.getAs[Long]("count"))
    assert(counts.length == 16, s"expected all 16 shards used, got ${counts.length}")
    // 512 docs over 16 shards = 32 expected; loose bound catches collapse
    assert(counts.max <= 3 * 32, s"worst shard too heavy: ${counts.max}")
    // packing invariants hold under the custom gate too
    assert(gated.count() == 512, "no doc may be lost or duplicated")
    gated.groupBy("shard", "pack")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("total") < 256L + r.getAs[Long]("biggest"),
          s"pack ${r.get(0)}/${r.get(1)} overflows: ${r.getAs[Long]("total")}")
      }
  }
  test("splitCorpus: disjoint, exhaustive, weight-shaped, partitioning-invariant") {
    val df = (1L to 2000L).toDF("id")
    val out = Curation.splitCorpus(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exhaustive partition: every row labeled, labels only from the spec
    assert(counts.values.sum == 2000 && counts.keySet == Set("train", "val", "test"),
      s"got $counts")
    // weight-shaped (the gate is uniform-ish, not exact): loose bands
    assert(counts("train") > 1400 && counts("train") < 1900, s"train=${counts("train")}")
    assert(counts("val") > 50 && counts("test") > 50, s"got $counts")
    // the provenance property: identical assignment under ANY physical
    // partitioning (randomSplit's seed does NOT have this)
    val repart = Curation.splitCorpus(df.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.orderBy("id").collect().map(_.getString(1)).toSeq ==
      repart.orderBy("id").collect().map(_.getString(1)).toSeq)
    // degenerate + invalid specs
    assert(Curation.splitCorpus(df, "id", Seq("all" -> 1.0))
      .select("split").distinct().head().getString(0) == "all")
    intercept[IllegalArgumentException](
      Curation.splitCorpus(df, "id", Seq("a" -> 0.5, "a" -> 0.5)))
    intercept[IllegalArgumentException](
      Curation.splitCorpus(df, "id", Seq("a" -> -1.0)))
  }

  test("shardCorpus: dense per-shard positions, partitioning-invariant, order decoupled") {
    val df = (1L to 1000L).toDF("id")
    val out = Curation.shardCorpus(df, "id", nShards = 8).cache()
    // every row assigned; positions within a shard are dense 0..count-1
    assert(out.count() == 1000)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(perShard.length == 8, "all 8 shards populated on dense ids")
    perShard.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1,
        s"shard ${r.getInt(0)} positions not dense: $r")
    }
    // provenance: identical (shard, pos) under any physical partitioning
    val repart = Curation.shardCorpus(df.repartition(7), "id", nShards = 8)
    assert(out.orderBy("id").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      repart.orderBy("id").collect().map(r => (r.getInt(1), r.getLong(2))).toSeq)
    // the within-shard order is NOT id order (it is a shuffle): some
    // shard must hold a pair where id order and pos order disagree
    val inversions = out.as[(Long, Int, Long)].collect()
      .groupBy(_._2).values.map { rows =>
        val byPos = rows.sortBy(_._3).map(_._1)
        byPos.zip(byPos.sorted).count { case (a, b) => a != b }
      }.sum
    assert(inversions > 0, "epoch shuffle left every shard in id order")
    out.unpersist()
    intercept[IllegalArgumentException](Curation.shardCorpus(df, "id", 0))
  }

  test("exportJsonlShards: lossless round trip incl. hostile strings, Hive shard layout") {
    val hostile = Seq(
      (0L, "line\nbreak and \"quotes\" and \\backslash"),
      (1L, "unicode é中文 and tab\tchar"),
      (2L, ""),
      (3L, "{\"looks\":\"like json\"}"))
      .toDF("doc_id", "text")
    val sharded = Curation.shardCorpus(hostile, "doc_id", nShards = 2)
    val out = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toFile,
      "shards").getPath
    val back = Curation.exportJsonlShards(sharded, out)
      .select("doc_id", "text", "shard", "pos")
    val want = sharded.select("doc_id", "text", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val got = back
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse(""), // Spark's JSON reader returns "" as null
        r.getInt(2), r.getLong(3))).toSet
    assert(got == want.map { case (id, t, s, p) => (id, t, s, p) })
    // Hive layout on disk: one directory per shard value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.subsetOf(Set("shard=0", "shard=1")) && dirs.nonEmpty)
  }

  test("dsirSelect: target-vocabulary docs outrank off-domain docs, deterministically") {
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta"),   // pure target vocabulary
      (2L, "gamma delta gamma delta gamma delta"), // pure off-domain
      (3L, "alpha beta gamma delta"),              // mixed
    ).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta")).toDF("doc_id", "text")
    def run() = Curation.dsirSelect(corpus, "doc_id", "text",
      target, "doc_id", "text", k = 2, numBuckets = 256)
      .select("doc_id", "weight9")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq, "selection must be identical across runs")
    assert(a.map(_._1).toSet == Set(1L, 3L),
      s"expected the target-vocab docs selected, got ${a.toSeq}")
    val w = a.toMap
    assert(w(1L) > w(3L), "pure target-vocab doc must outscore the mixed doc")
    OperatorCache.releaseAll(spark)
  }

  test("corpusManifest: counts and id range exact; checksum flips on any changed doc") {
    val docs = Seq(
      (1L, "alpha beta gamma", "a"), (2L, "delta epsilon", "a"),
      (3L, "zeta eta theta iota", "b"),
    ).toDF("doc_id", "text", "source")
    val m = Curation.corpusManifest(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
    assert(m.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq == Seq(("a", 2L, 5L, 1L, 2L), ("b", 1L, 4L, 3L, 3L)))
    // one-token edit in one doc flips that stratum's checksum, not the other's
    val edited = Seq(
      (1L, "alpha beta gammaX", "a"), (2L, "delta epsilon", "a"),
      (3L, "zeta eta theta iota", "b"),
    ).toDF("doc_id", "text", "source")
    val m2 = Curation.corpusManifest(edited, "doc_id", "text", "source")
      .orderBy("source").collect()
    assert(m(0).getLong(5) != m2(0).getLong(5), "stratum a checksum unchanged after edit")
    assert(m(1).getLong(5) == m2(1).getLong(5), "stratum b checksum changed spuriously")
    // the documented XOR caveat: an identical PAIR cancels — n_docs catches it
    val pair = Seq((1L, "same text", "a"), (2L, "same text", "a"))
      .toDF("doc_id", "text", "source")
    val mp = Curation.corpusManifest(pair, "doc_id", "text", "source").head()
    assert(mp.getLong(5) == 0L && mp.getLong(1) == 2L)
  }

  test("temperatureResample: tau=1 is identity, tau<1 flattens, expectation holds") {
    val df = (1L to 3000L).toDF("id")
      .withColumn("stratum", when(col("id") <= 2700, "big").otherwise("small"))
      .withColumn("n_toks", lit(10L))
    // tau = 1: every stratum rate is exactly 1.0 → one repeat each
    val ident = Curation.temperatureResample(df, "id", "n_toks", "stratum", 1.0)
    assert(ident.select("n_repeats").distinct().as[Long].collect().toSeq == Seq(1L))
    // tau = 0.5 on a 90/10 token split: small stratum up-weighted, big down
    val out = Curation.temperatureResample(df, "id", "n_toks", "stratum", 0.5).cache()
    val mean = out.groupBy("stratum").agg(avg(col("n_repeats")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mean("small") > 1.5 && mean("big") < 1.0,
      s"flattening failed: $mean")
    // expectation: realized repeats within 5% of the analytic rate
    // r_s = p_s*T/T_s with p_s ∝ f_s^0.5: p=(0.75,0.25) → r_big=0.75/0.9
    // = 0.8333, r_small=0.25/0.1 = 2.5
    assert(math.abs(mean("big") - 0.8333) < 0.04, s"big: ${mean("big")}")
    assert(math.abs(mean("small") - 2.5) < 0.13, s"small: ${mean("small")}")
    // partitioning-invariant repeat assignment
    val repart = Curation.temperatureResample(
      df.repartition(7), "id", "n_toks", "stratum", 0.5)
    assert(out.orderBy("id").select("n_repeats").as[Long].collect().toSeq ==
      repart.orderBy("id").select("n_repeats").as[Long].collect().toSeq)
    out.unpersist()
    intercept[IllegalArgumentException](
      Curation.temperatureResample(df, "id", "n_toks", "stratum", 0.0))
  }

  test("leakageSafeSplit: near-dup clusters never straddle; unpaired docs match splitCorpus") {
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    // every unique doc carries 3 doc-specific tokens, so cross-doc
    // 3-gram Jaccard stays far below the 0.9 threshold; copies are exact
    def textOf(seed: Long): String =
      (0 until 12).map(j =>
        if (j % 4 == 2) s"u${seed}x$j" else words(((seed + j) % 20).toInt))
        .mkString(" ")
    // 90 unique docs + 30 exact copies of docs 0..9 → 10 clusters of 4
    val rows = (0L until 90L).map(i => (i, textOf(i))) ++
      (0 until 30).map(j => (100L + j, textOf((j % 10).toLong)))
    val df = rows.toDF("id", "text")
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.leakageSafeSplit(df, "id", "text", weights, threshold = 0.9)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out.size == 120, "split must cover every doc exactly once")
    // the guard: every copy lands in its original's split
    (0 until 30).foreach { j =>
      assert(out(100L + j) == out((j % 10).toLong),
        s"copy ${100 + j} split ${out(100L + j)} != rep ${out((j % 10).toLong)}")
    }
    // unpaired docs (10..89) gate on their own id — identical to splitCorpus
    val plain = Curation.splitCorpus(df, "id", weights)
      .select("id", "split").as[(Long, String)].collect().toMap
    (10L until 90L).foreach(i =>
      assert(out(i) == plain(i), s"unpaired doc $i diverged from splitCorpus"))
    // precomputed-clusters path agrees with the mined path
    val clusters = Dedup.nearDupClusters(
      Dedup.minhashNearDups(df, "id", "text", threshold = 0.9))
    val reused = Curation.leakageSafeSplit(df, "id", "text", weights,
        clusters = clusters)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(reused == out, "precomputed clusters must reproduce the mined split")

    // the leakage audit: the id-gated split straddles EXACTLY the pairs
    // whose endpoints gate into different intervals (replayed here with
    // the same arithmetic); the cluster-gated split straddles zero
    val pairs = Dedup.minhashNearDups(df, "id", "text", threshold = 0.9)
    def splitOf(i: Long): String = {
      val g = ((i % 100000L) * 2654435761L) % 1000000L
      if (g < 800000) "train" else if (g < 900000) "val" else "test"
    }
    val pairRows = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    val expectStraddle = pairRows.count { case (a, b) => splitOf(a) != splitOf(b) }
    val naive = Curation.splitCorpus(df.select("id"), "id", weights)
    val nAudit = Curation.splitLeakageAudit(pairs, naive, "id")
      .as[(Long, Long)].head()
    assert(nAudit == ((pairRows.length.toLong, expectStraddle.toLong)),
      s"naive audit $nAudit != (${pairRows.length}, $expectStraddle)")
    assert(expectStraddle > 0, "fixture must actually exhibit leakage")
    val safe = Curation.leakageSafeSplit(df, "id", "text", weights,
      clusters = clusters).select("id", "split")
    val sAudit = Curation.splitLeakageAudit(pairs, safe, "id")
      .as[(Long, Long)].head()
    assert(sAudit == ((pairRows.length.toLong, 0L)),
      s"leakage-safe split must straddle zero pairs: $sAudit")
    // empty pairs → a zeros row, not an empty frame
    val empty = Curation.splitLeakageAudit(
      pairs.where(lit(false)), naive, "id").as[(Long, Long)].head()
    assert(empty == ((0L, 0L)))
    OperatorCache.releaseAll(spark)
  }
}
