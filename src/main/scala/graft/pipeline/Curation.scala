package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-curation operators for training-data pipelines: reproducible
  * subsampling (whole-corpus and per-stratum mixing weights) and greedy
  * sequence packing into fixed token budgets — the steps between "clean
  * corpus" and "training batches".
  *
  * All pseudo-randomness is the engine-portable Knuth multiplicative mix
  * over the id (the same pattern ivfTrain's init and syntheticAssets
  * use): pure integer arithmetic, so an external engine replays the
  * exact row selection — a sampling decision a training run cannot
  * reproduce later is a provenance bug, not randomness. Production
  * callers wanting a stronger mix pass their own gate column (e.g.
  * xxhash64); every operator takes the gate as a parameter.
  */
object Curation {

  /** Portable pseudo-random gate: uniform-ish value in [0, 1e6) derived
    * from the id by Knuth multiplicative mixing. The id is reduced mod
    * 1e5 first so the product stays in signed-64 range on any engine.
    * NOTE: ids congruent mod 1e5 share a gate value — fine for corpus
    * sampling (ids are dense), wrong for adversarial inputs; pass a real
    * hash gate then.
    */
  def idGate(id: Column, salt: Int = 0): Column =
    pmod((pmod(id.cast("long"), lit(100000L)) + lit(salt.toLong)) * lit(2654435761L),
      lit(1000000L))

  /** Number of order-preserving sub-buckets the per-stratum windows
    * below split their sort keys into. */
  private val DeskewBuckets = 1024

  /** Order-preserving clamp-bucketization of a sort key: monotone in
    * `key`, bounded to [0, [[DeskewBuckets]]). `unit` is the key range
    * one bucket covers — [[idGate]] keys (range 1e6) use ~977, token
    * counts use 64 (fine to 65k tokens). Keys outside [0, unit×1024)
    * clamp into the edge buckets: still CORRECT (monotone), just
    * degenerating toward the single-window plan — a custom gate should
    * map into the documented range for the de-skew to bite.
    *
    * This is what keeps per-stratum windows distributed under skew: a
    * window partitioned by (stratum, bucket) sorts ≤ 1/1024 of a
    * skewed stratum per task instead of the whole stratum in one, and
    * bucket counts aggregate map-side into a parameter-sized
    * (#strata × #occupied-buckets) offset frame that broadcasts back.
    * Exactness: the bucket is monotone in the leading sort key, so
    * within-bucket rank + the broadcast offset of earlier buckets IS
    * the per-stratum rank (rows in a lower bucket have strictly
    * smaller keys).
    */
  private def clampBucket(key: Column, unit: Long): Column =
    greatest(least(floor(key.cast("double") / unit), lit(DeskewBuckets - 1)),
      lit(0)).cast("long")

  /** Broadcastable per-(stratum, bucket) frame with `aggExpr`'s bucket
    * total (`__n`) and the EXCLUSIVE per-stratum running total over
    * earlier buckets (`__off`). The running-total window orders
    * parameter-sized per-stratum frames (≤ [[DeskewBuckets]] rows
    * each), never corpus rows.
    */
  private def bucketOffsets(
      df: DataFrame, strataCol: String, aggExpr: Column): DataFrame =
    bucketOffsets(df, Seq(strataCol), aggExpr)

  private def bucketOffsets(
      df: DataFrame, strataCols: Seq[String], aggExpr: Column): DataFrame =
    df.groupBy((strataCols.map(col) :+ col("__b")): _*).agg(aggExpr.as("__n"))
      .withColumn("__off",
        sum("__n").over(
          Window.partitionBy(strataCols.map(col): _*).orderBy("__b"))
          - col("__n"))
      .select((strataCols.map(col) :+ col("__b") :+ col("__off")): _*)

  /** Keep a reproducible `fraction` of rows: the same ids survive every
    * run, every engine, every cluster size — one scan, no shuffle, no
    * state. This is how a 100 TB corpus is subsampled (a `sample()` with
    * a seed is NOT reproducible across partitionings; a hash gate is).
    */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double,
      salt: Int = 0, gate: Column = null,
  ): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    df.where(g < lit(math.round(fraction * 1e6)))
  }

  /** Per-stratum sampling rates — the "mixing weights" step that
    * up/down-weights sources or languages when composing a training mix.
    * Strata absent from `fractions` use `defaultFraction`. Same gate
    * mechanics as [[deterministicSample]]; still one scan, no shuffle.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: Int = 0, gate: Column = null,
  ): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fractions must be in [0,1]: $f"))
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val threshold = fractions.foldLeft(lit(math.round(defaultFraction * 1e6))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * 1e6))).otherwise(acc)
    }
    df.where(g < threshold)
  }

  /** Reproducible, disjoint train/val/test split: the gate value in
    * [0, 1e6) falls into consecutive intervals sized by the (normalized)
    * weights, so the same id lands in the same split on every run,
    * engine, partitioning, and cluster size — the provenance property a
    * `randomSplit(seed)` does NOT have (its assignment depends on the
    * physical partitioning). One scan, map-only, no shuffle; the splits
    * PARTITION the corpus (every row gets exactly one label). The last
    * split absorbs interval rounding. Weights need not sum to 1.
    *
    * @return df + a `split` column with the assigned label
    */
  def splitCorpus(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      salt: Int = 0, gate: Column = null,
  ): DataFrame = {
    require(splits.nonEmpty, "splitCorpus needs at least one split")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct: ${splits.map(_._1)}")
    splits.foreach { case (n, w) =>
      require(w > 0, s"split weights must be positive: $n=$w") }
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val total = splits.map(_._2).sum
    // cumulative upper bounds in gate units; intervals are [prev, cum)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c / total * 1e6))
    val label =
      if (splits.size == 1) lit(splits.head._1)
      else splits.init.zip(cum.init).tail
        .foldLeft(when(g < lit(cum.head), lit(splits.head._1))) {
          case (acc, ((name, _), th)) => acc.when(g < lit(th), lit(name))
        }
        .otherwise(lit(splits.last._1))
    df.withColumn("split", label)
  }

  /** Leakage-safe train/val/test split: like [[splitCorpus]], but the
    * gate is computed on the doc's NEAR-DUP CLUSTER representative, so
    * near-duplicate documents always land in the SAME split — the
    * contamination guard an id-gated split does not have (a doc and its
    * near-copy gate independently, so ~evalFraction of every duplicate
    * cluster straddles train/eval, and the eval set silently measures
    * memorization of training near-copies).
    *
    * Pipeline: banded MinHash-LSH candidates verified at exact n-gram
    * Jaccard ≥ `threshold` ([[Dedup.minhashNearDups]] — never
    * all-pairs), min-label connected components
    * ([[Dedup.nearDupClusters]]), then one broadcast-size left join maps
    * each doc to its representative (unpaired docs — the overwhelming
    * majority at corpus scale — represent themselves and skip the join's
    * build side entirely). The gate arithmetic is [[splitCorpus]]'s,
    * applied to the representative id: members inherit the rep's
    * interval, so the split stays reproducible, disjoint, and
    * engine-replayable (the same integer mix, one indirection earlier).
    *
    * Fraction fidelity: intervals size CLUSTERS (by rep id), not docs —
    * with duplicate clusters small relative to the corpus (the real
    * regime), realized doc fractions converge to the weights; a corpus
    * that is one giant cluster lands whole in one split, which is the
    * correct degenerate behavior for a no-leakage guarantee.
    *
    * Scale shape: the cluster-label frame is proportional to the
    * DUPLICATED subset, not the corpus (nearDupClusters labels only
    * docs that appear in a verified pair), so the added cost over
    * [[splitCorpus]] is the dedup pipeline the curation run typically
    * executes anyway — callers holding labels from a prior dedup pass
    * them via `clusters` and pay only the join.
    *
    * @param clusters optional precomputed (doc, label) frame (the
    *   [[Dedup.nearDupClusters]] output) — pass it to reuse a dedup
    *   run's labels instead of re-mining pairs
    * @return df + a `split` column with the assigned label
    */
  def leakageSafeSplit(
      df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)],
      threshold: Double = 0.7, shingleK: Int = 3,
      numHashes: Int = 32, bands: Int = 8,
      salt: Int = 0, clusters: DataFrame = null,
  ): DataFrame = {
    val labels =
      if (clusters != null) clusters
      else Dedup.nearDupClusters(Dedup.minhashNearDups(
        df, idCol, textCol, threshold, shingleK, numHashes, bands))
    val rep = coalesce(col("__cluster_label"), col(idCol))
    val withRep = df.join(
        labels.select(col("doc").as("__cluster_doc"),
          col("label").as("__cluster_label")),
        col(idCol) === col("__cluster_doc"), "left")
    splitCorpus(withRep, idCol, splits, salt, gate = idGate(rep, salt))
      .drop("__cluster_doc", "__cluster_label")
  }

  /** Contamination audit for a train/eval split: count verified
    * near-dup pairs whose endpoints landed in DIFFERENT splits — the
    * number an id-gated split leaves nonzero (≈ 2·evalFraction of every
    * duplicate cluster's cross edges) and [[leakageSafeSplit]]
    * guarantees is zero. One row: (n_pairs, n_straddling). Two id-keyed
    * joins + one aggregate; pairs frames are ∝ the duplicated subset,
    * so the audit costs less than the dedup that produced them.
    *
    * @param pairs verified near-dup pairs (doc_a, doc_b) — e.g.
    *   [[Dedup.minhashNearDups]] output
    * @param split frame carrying `idCol` and `splitCol`
    */
  def splitLeakageAudit(
      pairs: DataFrame, split: DataFrame, idCol: String,
      splitCol: String = "split",
  ): DataFrame = {
    val a = split.select(col(idCol).as("doc_a"), col(splitCol).as("__sa"))
    val b = split.select(col(idCol).as("doc_b"), col(splitCol).as("__sb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L)),
          lit(0L)).as("n_straddling"))
  }

  /** Greedy sequence packing: assign each doc to a (shard, pack) so that
    * packs hold ~`budgetTokens` tokens — how pretraining examples are
    * composed from variable-length documents without padding waste.
    *
    * Scale shape: docs are sharded by the portable id mix (`shards`
    * independent packing groups — whole-corpus optimal packing is
    * NP-hard bin packing and pointless at scale; shard-local greedy fill
    * is what training pipelines run, one shard per writer task). Within
    * a shard, docs order deterministically (tokens desc, id) and fill by
    * running token count: pack = floor(exclusive_prefix / budget). One
    * window over the shard-keyed exchange — no global sort, no driver
    * state, no iteration.
    *
    * Packing guarantee: every pack's token total < budgetTokens + its
    * largest doc (the floor rule lets the straddling doc overflow the
    * boundary rather than opening a gap). Docs longer than the budget
    * land in packs of their own. Exact never-exceed packing needs
    * running state that neither a window nor an external replay can
    * express — bounded overflow is the honest distributed contract.
    *
    * Token contract: `tokenCol` must be a NON-NEGATIVE count on every
    * row. A null or negative value raises (wrapped in the Spark job
    * failure) instead of silently shrinking the running sum — a -1 from
    * `size(split(NULL))` upstream would otherwise corrupt the cumulative
    * fill and void the bounded-overflow guarantee for its whole shard.
    *
    * @param gate shard-assignment gate (any integral column; `pmod` into
    *   `shards` buckets). Defaults to [[idGate]], which is only uniform
    *   when ids are dense — SPARSE 64-bit ids (e.g. xxhash64-derived)
    *   collide mod 1e5 and collapse onto few shards; pass
    *   `xxhash64(col(id))` then, as with the sampling operators.
    * @return input columns + (shard, pack, n_tokens)
    */
  /** Token-budget sampling per stratum: take documents from each stratum
    * in the deterministic gate order until the stratum's TOKEN budget is
    * reached — how a training mixture is composed when the recipe says
    * "20 B tokens of web, 2 B of code", not "x% of rows" (row-fraction
    * sampling over-represents sources with long documents).
    *
    * Order within a stratum is (gate, id) — the same engine-replayable
    * [[idGate]] mix the row samplers use — so the selection is
    * reproducible everywhere. A doc is kept while the EXCLUSIVE running
    * token sum is under budget, so the straddling doc overflows the
    * boundary rather than leaving a gap (the [[packSequences]]
    * bounded-overflow rule; budget 0 takes nothing). Token counts must
    * be non-negative — null/negative raises, like packSequences.
    *
    * Scale shape: the de-skewed gate-bucket running total
    * ([[clampBucket]]) — per-(stratum, bucket) token sums aggregate
    * map-side into a broadcastable offset frame, buckets starting at
    * or past the budget drop before any sort, and the running-sum
    * window partitions by (stratum, bucket), so a heavily skewed
    * stratum sorts ≤ 1/1024 of itself per task (and under a small
    * budget, only the buckets up to the boundary at all). No driver
    * state, no iteration.
    *
    * @return surviving rows (original columns, unchanged)
    */
  def sampleByTokenBudget(
      df: DataFrame, idCol: String, tokenCol: String, strataCol: String,
      budgets: Map[String, Long], defaultBudget: Long = 0L,
      salt: Int = 2, gate: Column = null,
  ): DataFrame = {
    (budgets.values.toSeq :+ defaultBudget).foreach(b =>
      require(b >= 0, s"budgets must be >= 0: $b"))
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val nTok = col(tokenCol).cast("long")
    val checked = when(nTok.isNull.or(nTok < 0),
      raise_error(concat(
        lit(s"sampleByTokenBudget: token column '$tokenCol' must be a non-negative count, got "),
        coalesce(nTok.cast("string"), lit("NULL")),
        lit(" for id "), col(idCol).cast("string"))))
      .otherwise(nTok)
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    // the bucket unit assumes the default idGate range [0, 1e6) — a
    // custom full-range gate clamps into the edge buckets (correct,
    // just un-de-skewed; see clampBucket)
    val bucketed = df.withColumn("__b", clampBucket(g, 977L))
    // per-bucket token sums also run the non-negative check over EVERY
    // row (including ones a later filter drops) — the validation
    // contract is corpus-wide, like the single-window original
    val offs = bucketOffsets(bucketed, strataCol, sum(checked))
    val w = Window.partitionBy(col(strataCol), col("__b"))
      .orderBy(g.asc, col(idCol).asc)
    bucketed.join(broadcast(offs), Seq(strataCol, "__b"))
      .where(col("__off") < budget)
      .withColumn("__cum", col("__off") + sum(checked).over(w) - checked)
      .where(col("__cum") < budget)
      // the join fronts its keys — restore the input column order
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Data-constrained mixture composition WITH upsampling (Muennighoff
    * et al. 2023 data-constrained scaling; the multi-epoch domain
    * recipe): per domain, meet a TOKEN target that may EXCEED the
    * available tokens — "4.2 epochs of wikipedia" — by assigning every
    * doc `floor(target / available)` whole-corpus epochs plus one more
    * for the docs in a deterministic fractional top-up frontier covering
    * the remainder. The repetition is never materialized: the output is
    * the input row + `repeat_count`, and the consumer (packSequences,
    * an exporter) explodes it shard-local. [[sampleByTokenBudget]] is
    * the downsampling special case (targets below available ⇒ epochs 0,
    * the frontier alone).
    *
    * Contract: delivered tokens per domain = epochs·available +
    * top-up ∈ [target, target + straddling doc) whenever the domain has
    * any tokens (the bounded-overflow frontier rule shared with
    * [[sampleByTokenBudget]]; the top-up keeps docs while the EXCLUSIVE
    * (gate, id)-ordered running token sum is under the remainder). A
    * domain absent from `targets` (or target 0) yields nothing; a
    * zero-token domain with a positive target yields nothing — as in
    * [[composeMixture]], targets are DEMAND and starvation stays
    * visible. Token counts must be non-negative; null/negative raises.
    *
    * Scale shape: one domain-grained token-sum aggregate (map-side
    * combined, parameter-sized, broadcast back), then the same
    * de-skewed gate-bucket running-sum window as
    * [[sampleByTokenBudget]] — per-(domain, bucket) partitions sort
    * ≤ 1/[[DeskewBuckets]] of a skewed domain per task, offsets ride a
    * broadcast; everything else is map-only. No driver state, no
    * iteration, no repeated-text shuffle.
    *
    * @param targets tokens wanted per domain value; missing domains get
    *   `defaultTarget`
    * @param gate see [[sampleByTokenBudget]] — dense-id default, pass
    *   `xxhash64` for sparse ids
    * @return input columns + `repeat_count` (≥ 1; zero-repeat rows drop)
    */
  def epochMixture(
      df: DataFrame, idCol: String, tokenCol: String, domainCol: String,
      targets: Map[String, Long], defaultTarget: Long = 0L,
      salt: Int = 6, gate: Column = null,
  ): DataFrame = {
    (targets.values.toSeq :+ defaultTarget).foreach(t =>
      require(t >= 0, s"targets must be >= 0: $t"))
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val nTok = col(tokenCol).cast("long")
    val checked = when(nTok.isNull.or(nTok < 0),
      raise_error(concat(
        lit(s"epochMixture: token column '$tokenCol' must be a non-negative count, got "),
        coalesce(nTok.cast("string"), lit("NULL")),
        lit(" for id "), col(idCol).cast("string"))))
      .otherwise(nTok)
    val target = targets.foldLeft(lit(defaultTarget)) {
      case (acc, (domain, t)) =>
        when(col(domainCol) === domain, lit(t)).otherwise(acc)
    }
    val bucketed = df.withColumn("__b", clampBucket(g, 977L))
    val avail = bucketed.groupBy(col(domainCol))
      .agg(sum(checked).as("__avail"))
    val offs = bucketOffsets(bucketed, domainCol, sum(checked))
    // integer epochs/remainder on exact integer arithmetic: the DECIMAL
    // division runs on a numerator that is an exact multiple of the
    // divisor, so the cast back to long is exact at any magnitude (a
    // double division would round past 2^53)
    val epochs = when(col("__avail") > 0,
      ((target - pmod(target, col("__avail"))).cast("decimal(38,0)") /
        col("__avail").cast("decimal(38,0)")).cast("long"))
      .otherwise(lit(0L))
    val remainder = when(col("__avail") > 0, pmod(target, col("__avail")))
      .otherwise(lit(0L))
    val w = Window.partitionBy(col(domainCol), col("__b"))
      .orderBy(g.asc, col(idCol).asc)
    val cum = col("__off") + sum(checked).over(w) - checked
    bucketed
      .join(broadcast(avail), domainCol)
      .join(broadcast(offs), Seq(domainCol, "__b"))
      .withColumn("repeat_count",
        epochs + when(cum < remainder, lit(1L)).otherwise(lit(0L)))
      .where(col("repeat_count") > 0)
      .select(df.columns.map(col).toIndexedSeq :+ col("repeat_count"): _*)
  }

  /** Sliding-window document chunking: split each doc into overlapping
    * token windows — the step that turns cleaned documents into
    * retrieval-index entries or fixed-context training examples. Chunk
    * starts are 0, stride, 2·stride, … while they fall inside the doc;
    * the last chunk is allowed to be short (every token is covered;
    * stride ≤ chunkTokens gives overlap chunkTokens − stride).
    *
    * Scale shape: MAP-ONLY — tokens are split once per row and the
    * window slices are assembled per start offset with
    * `transform`+`slice` over that array, then exploded; no shuffle, no
    * state, embarrassingly parallel in rows. (The per-element lambda is
    * interpreted, but each element's work is one bounded slice+join over
    * an already-computed attribute — ~chunk/stride× the doc's token
    * count in total, a constant factor, unlike the per-element
    * re-tokenization trap the corpus hash paths avoid with explode
    * shapes.) Docs with no tokens yield no chunks.
    *
    * TEXT FIDELITY (r19 ADVICE): `chunk_text` is the window's tokens
    * re-joined with single spaces. Tokens keep their source codepoints
    * verbatim (case, punctuation — the preserve-text [[Dedup.segSplitOf]]
    * split), but the JOINS are not the source whitespace: runs of
    * whitespace collapse to one space, and segmented-script text
    * (CJK/Thai/Lao/Khmer/Myanmar/Tibetan) comes back with a space
    * between every codepoint — the same normalized form the token
    * budget counted. Downstream consumers that need byte-faithful
    * source slices should treat chunk boundaries as token indices
    * (start = chunk_idx · stride, length = n_tokens) and re-slice the
    * original text themselves; the training-data consumers here
    * tokenize again anyway, for which the normalized form is the
    * canonical input. The same applies to [[materializePacks]]' packed
    * text.
    *
    * @return (idCol, chunk_idx, chunk_text, n_tokens) — chunk_idx is the
    *         0-based window index (start = chunk_idx · stride)
    */
  def chunkDocuments(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int = 0,
  ): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val stride = if (strideTokens <= 0) chunkTokens else strideTokens
    require(stride <= chunkTokens,
      s"strideTokens ($stride) must not exceed chunkTokens ($chunkTokens) — gaps would drop tokens")
    // script-aware split: CJK/Thai runs chunk per codepoint instead of
    // riding one whole-sentence "token" past the budget; native
    // single-pass split, tokens keep source codepoints (chunk_text
    // reassembles faithfully up to whitespace normalization)
    val toks = Dedup.segSplitOf(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("__toks")) - 1) / lit(stride)).cast("int")),
          i => struct(
            array_join(slice(col("__toks"), i * stride + 1, lit(chunkTokens)), " ")
              .as("chunk_text"),
            least(lit(chunkTokens), size(col("__toks")) - i * stride)
              .as("n_tokens")))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col.chunk_text").as("chunk_text"),
        col("col.n_tokens").cast("long").as("n_tokens"))
  }

  /** Sentence-aware document chunking — [[chunkDocuments]]'s
    * boundary-respecting sibling, the shape embedding/RAG pipelines
    * actually want: a chunk never cuts a sentence in half. Sentences
    * split on terminal punctuation (`[.!?]` followed by whitespace —
    * deliberately simple, deterministic, and RE2-replayable; no
    * abbreviation dictionary), then pack greedily into ≤ `maxTokens`
    * chunks by the same exclusive-running-sum floor rule
    * [[packSequences]] uses: a sentence belongs to chunk
    * ⌊(tokens before it) / maxTokens⌋, so a chunk overflows the budget
    * by at most its last sentence, and a single sentence longer than
    * the budget becomes its own oversized chunk rather than being
    * split.
    *
    * Scale shape: the sentence explode is map-only; one doc-keyed
    * window (running token sum) and one (doc, chunk) aggregate — no
    * state, no driver work. Texts are assumed free of U+0001 (the
    * internal boundary marker).
    *
    * @return (idCol, chunk_idx, chunk_text, n_sentences, n_tokens),
    *         chunk_idx 0-based per doc; empty docs yield no chunks
    */
  def chunkBySentences(
      df: DataFrame, idCol: String, textCol: String, maxTokens: Int,
  ): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val marked = regexp_replace(trim(col(textCol)), "([.!?])\\s+", "$1\u0001")
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), posexplode(split(marked, "\u0001")))
      .select(col(idCol), col("pos"), trim(col("col")).as("sent"))
      .where(col("sent") =!= "")
      .withColumn("n_toks",
        size(Dedup.segSplitOf(col("sent"))).cast("long"))
      .withColumn("chunk_idx",
        floor((sum("n_toks").over(w) - col("n_toks")) / maxTokens).cast("int"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sent")))),
          x => x.getField("sent")), " ").as("chunk_text"),
        count(lit(1)).as("n_sentences"),
        sum("n_toks").as("n_tokens"))
  }

  /** Deterministic global shuffle into training shards: every row gets a
    * `shard` in [0, nShards) and a 0-based `pos` within the shard, both
    * derived only from the id — the "epoch shuffle" that turns a curated
    * corpus into randomized, reproducibly-ordered training shards. The
    * same id lands at the same (shard, pos) on every run, engine,
    * partitioning, and cluster size; a `df.orderBy(rand(seed))` does
    * not have that property (ties and partitioning change the order),
    * and is a full global sort besides.
    *
    * Scale shape: the shard assignment is map-only; the within-shard
    * position is one row_number window per shard. A shard is one sorted
    * window partition, so nShards is the scale knob: pick it so a shard
    * is one output file of the size your trainer streams (a few GB) —
    * shard count grows with the corpus, the per-shard sort stays
    * bounded, and the sink's `partitionBy("shard")` writes each shard
    * in one task with no further exchange. Same per-group-window
    * contract (and the same sparse-id gate caveat) as [[packSequences]].
    *
    * Two independent gate mixes (salt, salt+1) decouple the shard
    * choice from the within-shard order — rows of one shard share
    * `shardGate mod nShards`, so ordering by a fresh mix (tie-broken by
    * id) keeps the order pseudo-random rather than gate-banded.
    *
    * @return input columns + (shard: int, pos: long)
    */
  def shardCorpus(
      df: DataFrame, idCol: String, nShards: Int, salt: Int = 3,
      gate: Column = null, orderGate: Column = null,
  ): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val og = if (orderGate != null) orderGate else idGate(col(idCol), salt + 1)
    val w = Window.partitionBy("shard").orderBy(og.asc, col(idCol).asc)
    df.withColumn("shard", pmod(g, lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every corpus
    * doc by the log-likelihood ratio of its hashed-unigram bag under a
    * TARGET-domain unigram model vs the CORPUS model, keep the top k.
    * The published method resamples with Gumbel noise; this engine keeps
    * the deterministic top-k (the same replayability stance as
    * [[splitCorpus]] — a selection a pipeline cannot reproduce later is
    * a provenance bug).
    *
    * Fixed-point like [[TextClassifier]]: per-bucket log-ratios
    * ln(tcnt+1) − ln(Σt+B) − ln(scnt+1) + ln(Σs+B) are rounded to the
    * 1e9 grid ONCE (a last-ulp ln() difference between engines dies at
    * the grid, it never compounds), so every per-doc score
    * Σ_b c_b·lw_b is exact integer arithmetic — order-independent,
    * partitioning-independent, oracle-replayable.
    *
    * Scale shape: two feature passes (explode + (doc,bucket) aggregate,
    * the [[TextClassifier.features]] frame), two B-row bucket aggregates
    * collected to the driver (B = numBuckets, parameter-bounded — the
    * model IS those B longs), the scoring pass is map-side with the
    * weight array riding as a typedlit, and the top-k is
    * TakeOrderedAndProject (never a global sort).
    *
    * @return corpus rows of the k selected docs + weight9 (their scaled
    *         log-ratio score)
    */
  def dsirSelect(
      corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetIdCol: String, targetTextCol: String,
      k: Int, numBuckets: Int = 256,
  ): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val cf = OperatorCache.materialize(TextClassifier.features(
      corpus.withColumn("__y", lit(0L)), idCol, textCol, "__y", numBuckets))
    val tf = TextClassifier.features(
      target.withColumn("__y", lit(0L)), targetIdCol, targetTextCol, "__y",
      numBuckets)
    def bucketCounts(f: DataFrame): Map[Int, Long] =
      f.groupBy("bucket").agg(sum(col("c")).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sCnt = bucketCounts(cf)
    val tCnt = bucketCounts(tf)
    // add-one smoothing: denominators are Σ(cnt+1) = Σcnt + B
    val sTot = (sCnt.values.sum + numBuckets).toDouble
    val tTot = (tCnt.values.sum + numBuckets).toDouble
    val lw: Seq[Long] = (0 until numBuckets).map { b =>
      math.round(1000000000.0 *
        (math.log((tCnt.getOrElse(b, 0L) + 1L).toDouble) - math.log(tTot) -
          math.log((sCnt.getOrElse(b, 0L) + 1L).toDouble) + math.log(sTot)))
    }
    val wLit = typedlit(lw)
    val top = cf.groupBy("doc")
      .agg(sum(col("c") * element_at(wLit, col("bucket") + 1)).as("weight9"))
      .orderBy(col("weight9").desc, col("doc").asc)
      .limit(k)
    corpus.join(top, corpus(idCol) === top("doc"), "inner").drop("doc")
  }

  /** Sharded JSONL export — the standard training-data handoff format:
    * one JSON object per line, one `shard=k/` directory per shard
    * (Hive-style partitioning, so a downstream loader reads a single
    * shard's directory directly and the cluster writes every shard in
    * parallel with no exchange beyond what the caller's sharding
    * already did — partitionBy routes rows within each task's output).
    * Returns the read-back frame so callers can pin losslessness:
    * JSON string escaping round-trips text exactly (newlines, quotes,
    * unicode — one caveat: Spark's JSON reader can surface an empty
    * string as null, spec-pinned), and long scalars read back
    * bit-identically. The shard column moves into the directory name on
    * write and is re-derived from the path on read — standard Hive
    * layout.
    */
  def exportJsonlShards(df: DataFrame, path: String,
      shardCol: String = "shard"): DataFrame = {
    df.write.mode("overwrite").partitionBy(shardCol).json(path)
    df.sparkSession.read.json(path)
  }

  /** Per-stratum corpus manifest: the provenance card a 100 TB pipeline
    * writes next to every published corpus snapshot so a consumer can
    * verify what they received without re-reading it — doc and token
    * counts, the id range, and an order-independent content checksum
    * (XOR of the portable FNV-1a64 text hashes; XOR so the value is
    * independent of partitioning and arrival order, and any single
    * changed/missing doc flips it. Caveat, documented here on purpose:
    * a PAIR of identical docs cancels in XOR — the doc count catches
    * that). One scan, one partial-aggregate shuffle to |strata| rows.
    *
    * @return (strataCol, n_docs, n_tokens, min_id, max_id, checksum)
    */
  def corpusManifest(
      df: DataFrame, idCol: String, textCol: String, strataCol: String,
  ): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(Dedup.segSplitOf(col(textCol)))
          .cast("long")).as("n_tokens"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        expr(s"bit_xor(graft_fnv1a64($textCol))").as("checksum"))
  }

  /** Temperature-based mixture resampling (the XLM-R / multilingual-LM
    * recipe): stratum s with token share f_s is re-targeted to
    * p_s ∝ f_s^τ — τ < 1 flattens the mixture, up-weighting small
    * strata — and every doc gets an integer `n_repeats` whose
    * expectation matches the stratum's repetition rate
    * r_s = p_s · T / T_s: floor(r_s) guaranteed repeats plus one more
    * when the doc's portable gate falls under the fractional part.
    * Deterministic everywhere: r_s is rounded to 6 decimals (the repo's
    * cross-engine float convention) before the floor/fraction split,
    * and the per-doc bump is the same [[idGate]] mix the samplers use —
    * so the exact repeat multiset is engine-replayable, unlike any
    * rand()-based resampler. Downsampling falls out free: r_s < 1 gives
    * n_repeats ∈ {0, 1} with probability r_s.
    *
    * Scale shape: one stratum-grained aggregate (tiny), two scalar
    * reductions of it that ride back as broadcast 1-row frames (the
    * repo's scalar crossJoin(broadcast) idiom), one broadcast join of
    * the |strata|-row rate table onto the corpus, then map-only
    * arithmetic. No corpus-keyed shuffle at all.
    *
    * @return input columns + (n_repeats: long); materialize physical
    *         copies downstream with `posexplode(sequence(1, n_repeats))`
    *         when the trainer wants rows rather than weights
    */
  /** Compose a training mixture end to end: [[domainReweight]]'s
    * DoReMi-style weights → integer per-domain doc targets → the actual
    * per-domain selection, one call from corpus to mixture.
    *
    * Apportionment is the CUMULATIVE-QUOTA method on the exact integer
    * micro-weights (target_d = ⌊B·cum_d/T⌋ − ⌊B·cum_{d−1}/T⌋ over
    * domains in name order): targets telescope to exactly `budgetDocs`,
    * non-negative, and pure BIGINT arithmetic — the floor division is
    * done as (x − x mod T)/T so both engines compute the identical
    * integer (a double `floor(x/T)` can land one off at exact-quotient
    * boundaries). Selection within a domain is the deterministic
    * (idGate, id) order every sampler here uses.
    *
    * Targets are DEMAND: a domain holding fewer docs than its target
    * yields everything it has and the output falls short of the budget
    * by that much — visible in the result count, never silently filled
    * from other domains (upsampling a starved domain is
    * [[temperatureResample]]'s job, a deliberate decision, not a side
    * effect). Exactness holds whenever every domain covers its target.
    *
    * Scale shape: the reweight machinery's exchanges + a window over
    * the PARAMETER-bounded domain frame (cumsum over #domains rows —
    * single partition by construction, like buildVocab's rank) + one
    * broadcast join of targets + the de-skewed gate-bucket selection
    * ([[clampBucket]]): bucket counts aggregate map-side, offsets
    * broadcast back, buckets past the target drop before any sort, and
    * the rank window partitions by (domain, bucket) — a heavily skewed
    * domain is ≤ 1/1024 of itself per sort task, never one partition.
    */
  def composeMixture(
      df: DataFrame, idCol: String, textCol: String, domainCol: String,
      budgetDocs: Long, eta: Double = 1.0, rounds: Int = 1): DataFrame = {
    require(budgetDocs >= 0, s"budgetDocs must be >= 0: $budgetDocs")
    val w = domainReweight(df, idCol, textCol, domainCol, eta, rounds)
      .select(col("domain"),
        round(col("weight") * 1e6).cast("long").as("__micro"))
    val winAll = Window.orderBy("domain")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = w
      .withColumn("__cum", sum("__micro").over(winAll))
      .withColumn("__tot", sum("__micro").over(
        Window.orderBy("domain").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    def floorDiv(x: Column, t: Column): Column =
      ((x - pmod(x, t)) / t).cast("long")
    val targets = cum.select(col("domain"),
      (floorDiv(lit(budgetDocs) * col("__cum"), col("__tot")) -
        floorDiv(lit(budgetDocs) * (col("__cum") - col("__micro")), col("__tot")))
        .as("__target"))
    selectTopPerDomain(
      df.select(col(idCol), col(domainCol).as("domain")), idCol, targets)
  }

  /** [[composeMixture]]'s selection tail, de-skewed: keep each domain's
    * first `__target` docs in (idGate, id) order. Gate-bucket counts →
    * broadcast exclusive offsets → buckets whose offset already covers
    * the target drop BEFORE any sort → within-bucket rank + offset is
    * the per-domain rank. A 90%-mass domain sorts ≤ 1/1024 of itself
    * per task (and under a small target, only the buckets up to the
    * boundary at all) instead of one corpus-sized partition.
    *
    * @param df      frame with `idCol` and a `domain` column
    * @param targets (domain, __target) frame, parameter-sized
    * @return (doc, domain) — the selected docs
    */
  private[graft] def selectTopPerDomain(
      df: DataFrame, idCol: String, targets: DataFrame): DataFrame = {
    val keyed = df.select(col(idCol).as("doc"), col("domain"),
      idGate(col(idCol)).as("__gate"))
      .withColumn("__b", clampBucket(col("__gate"), 977L))
    val offs = bucketOffsets(keyed, "domain", count(lit(1)))
    val sel = Window.partitionBy("domain", "__b")
      .orderBy(col("__gate"), col("doc"))
    keyed.join(broadcast(targets), "domain")
      .join(broadcast(offs), Seq("domain", "__b"))
      .where(col("__off") < col("__target"))
      .withColumn("__rk", row_number().over(sel) + col("__off"))
      .where(col("__rk") <= col("__target"))
      .select(col("doc"), col("domain"))
  }

  /** Cap every stratum at `cap` rows, keeping each stratum's first `cap`
    * in deterministic (gate, id) order — the per-host contribution cap a
    * web-corpus mix applies so one domain cannot dominate training data
    * ("at most N pages per host").
    *
    * Deliberately the PLAIN rank window, not the [[clampBucket]]
    * machinery: a CONSTANT `row_number() <= cap` rewrites to
    * WindowGroupLimit (the same optimization TextSearch's frontier
    * leans on), which keeps ≤ cap rows per stratum map-side BEFORE the
    * exchange — so a 90%-mass mega-host never materializes as one sort
    * task and the shuffle carries ~cap rows per stratum, with strata
    * counts unbounded (hosts number millions at crawl scale). Measured
    * (CapScaleBench, 50M rows, 90% mega-host + 1M tail hosts, cap=100):
    * this shape 4.7–5.1s vs 6.3–7.4s for a bucket-offset-join variant —
    * the de-skew buckets only earn their exchanges when the per-stratum
    * limit is a VARIABLE column ([[selectTopPerDomain]]'s targets),
    * which no static group-limit rewrite can absorb.
    *
    * @param gate deterministic order within a stratum (default
    *   [[idGate]]; pass `xxhash64(col(id))` for sparse ids)
    * @return the input columns, ≤ `cap` rows per stratum
    */
  def capPerStratum(
      df: DataFrame, idCol: String, strataCol: String, cap: Long,
      salt: Int = 0, gate: Column = null,
  ): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(strataCol)).orderBy(g, col(idCol))))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Weighted sampling WITHOUT replacement via priority sampling
    * (Efraimidis & Spirakis 2006, algorithm A-ES): each row draws a
    * deterministic uniform u from the portable FNV hash of its id and
    * competes with key ln(u)/w — the k largest keys are a true
    * w-proportional sample, and because u is hash-derived the draw is
    * REPLAYABLE: same corpus, same salt, same sample, on any engine.
    * (The id-mix gates above are row-fraction samplers; this is the
    * weight-proportional one — "sample 10k docs by token mass".)
    *
    * Exactness: u = (low53(h) + 0.5) / 2^53 is exact double arithmetic
    * in both engines (no rounding anywhere before the ln), and the
    * RANKING key is the 6-rounded ln(u)/w with id tie-break, so a
    * last-ulp ln() divergence between engines cannot reorder the
    * selection frontier.
    *
    * Scale shape: map-only scoring + `orderBy.limit(k)` —
    * TakeOrderedAndProject, each partition keeps k rows and the driver
    * merges k·partitions, never a global sort. Weights must be
    * positive; null/non-positive rows raise rather than silently
    * vanishing from the sampling frame.
    */
  def prioritySample(
      df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "#es"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val wRaw = col(weightCol)
    val weight = when(wRaw.isNull || wRaw <= 0,
      raise_error(concat(lit(s"prioritySample: non-positive weight for id="),
        col(idCol).cast("string")))).otherwise(wRaw.cast("double"))
    val h = graft.functions.GraftFunctions.fnv1a64(
      concat(col(idCol).cast("string"), lit(salt)))
    val low53 = h.bitwiseAND(lit((1L << 53) - 1L))
    val u = (low53.cast("double") + lit(0.5)) / lit(9007199254740992.0)
    df.withColumn("sample_key", round(log(u) / weight, 6))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(k)
  }

  /** DoReMi-style domain mixture reweighting (Xie et al. 2023): upweight
    * domains whose loss under the current (proxy) model EXCEEDS the
    * reference loss — the domains the model finds hardest relative to
    * baseline get more training share. This is the deterministic batch
    * analogue: the loss model is the in-engine self-trained
    * [[TextAnalysis.unigramNll]], the reference is the corpus-wide
    * token-weighted mean NLL, and the multiplicative-weights update with
    * per-domain-constant losses collapses to its closed form
    * w_d ∝ share_d · exp(η·rounds·max(L_d − L_ref, 0)), normalized
    * (share_d = the token share, DoReMi's initial distribution).
    *
    * Determinism across engines: the per-doc nll arrives ROUNDED to 6
    * decimals, so micro-NLL = round(nll·1e6) is an exact integer and the
    * token-weighted domain sums are EXACT BIGINT arithmetic — no
    * float-sum association drift; doubles only appear in the final
    * per-domain ratio/exp/normalize over a handful of rows.
    *
    * Scale shape: the scorer's own exchanges + one doc-keyed join to
    * re-attach the domain + one map-side-combined domain aggregate;
    * the totals and the normalizer ride 1-row broadcasts. The output is
    * domain-grained — feed it straight into [[temperatureResample]] or
    * [[stratifiedSample]] as the mixing weights.
    */
  def domainReweight(
      df: DataFrame, idCol: String, textCol: String, domainCol: String,
      eta: Double = 1.0, rounds: Int = 1): DataFrame = {
    val scored = TextAnalysis.unigramNll(df, idCol, textCol)
    val domains = df.select(col(idCol).as("doc"), col(domainCol).as("domain"))
    val dom = scored.join(domains, "doc")
      .select(col("domain"), col("n_tokens"),
        (round(col("nll") * 1e6).cast("long") * col("n_tokens")).as("micro"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("micro").as("micro"))
    val totals = dom.agg(sum("n_tokens").as("__T"), sum("micro").as("__M"))
    val lD = (col("micro").cast("double") / 1e6) / col("n_tokens").cast("double")
    val lRef = (col("__M").cast("double") / 1e6) / col("__T").cast("double")
    val excess = greatest(lD - lRef, lit(0.0))
    val scoredDom = dom.crossJoin(broadcast(totals)) // 1-row scalars
      .withColumn("__numer",
        (col("n_tokens").cast("double") / col("__T").cast("double")) *
          exp(lit(eta * rounds) * excess))
      .withColumn("__mean_nll", lD)
      .withColumn("__excess", excess)
    val normalizer = scoredDom.agg(sum("__numer").as("__D"))
    scoredDom.crossJoin(broadcast(normalizer)) // 1-row scalar
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("__mean_nll"), 6).as("mean_nll"),
        round(col("__excess"), 6).as("excess"),
        round(col("__numer") / col("__D"), 6).as("weight"))
  }

  def temperatureResample(
      df: DataFrame, idCol: String, tokenCol: String, strataCol: String,
      temperature: Double, salt: Int = 5, gate: Column = null,
  ): DataFrame = {
    require(temperature > 0 && temperature <= 1,
      s"temperature must be in (0, 1]: $temperature")
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokenCol).cast("long")).as("__ts"))
    val grand = totals.agg(sum(col("__ts")).as("__t"))
    val powed = totals.crossJoin(broadcast(grand))
      .withColumn("__fst",
        pow(col("__ts").cast("double") / col("__t").cast("double"),
          lit(temperature)))
    val z = powed.agg(sum(col("__fst")).as("__z"))
    val rates = powed.crossJoin(broadcast(z))
      .withColumn("__r",
        round(col("__fst") / col("__z") * col("__t").cast("double") /
          col("__ts").cast("double"), 6))
      .select(col(strataCol), col("__r"))
    df.join(broadcast(rates), strataCol)
      .withColumn("n_repeats",
        floor(col("__r")).cast("long") +
          when(g < round((col("__r") - floor(col("__r"))) * 1e6).cast("long"), 1L)
            .otherwise(0L))
      .drop("__r")
  }

  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      budgetTokens: Long, shards: Int = 64, salt: Int = 1,
      gate: Column = null,
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(shards > 0, s"shards must be positive: $shards")
    val g = if (gate != null) gate else idGate(col(idCol), salt)
    val nTok = col(tokenCol).cast("long")
    val sharded = df
      .withColumn("shard", pmod(g, lit(shards.toLong)).cast("int"))
      .withColumn("n_tokens",
        when(nTok.isNull.or(nTok < 0),
          raise_error(concat(
            lit(s"packSequences: token column '$tokenCol' must be a non-negative count, got "),
            coalesce(nTok.cast("string"), lit("NULL")),
            lit(" for id "), col(idCol).cast("string"))))
          .otherwise(nTok))
    val w = Window.partitionBy("shard")
      .orderBy(col("n_tokens").desc, col(idCol).asc)
    sharded
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack",
        floor((col("__cum") - col("n_tokens")).cast("double") / budgetTokens.toDouble)
          .cast("long"))
      .drop("__cum")
  }

  /** Relatedness-grouped sequence packing (the "in-context
    * pretraining" shape, Shi et al. 2023, arXiv:2310.10638): instead
    * of packing documents in arbitrary order, every pack draws only
    * from ONE relatedness cell — IVF cluster, topic label, registrable
    * host, whatever grouping the caller supplies — so a training
    * sequence's context window contains semantically related
    * neighbors rather than random concatenation. The caller computes
    * the cell column (e.g. [[graft.pipeline.Similarity.ivfIndex]] over
    * an embedding column, which is map-only against `typedlit`
    * centroids); this operator is deliberately decoupled from HOW
    * relatedness was derived.
    *
    * Packing rule matches [[packSequences]]: within each (cell,
    * subshard), docs order by (gate, id) — [[idGate]] then id, the
    * repo's deterministic spread order, which doubles as the de-skew
    * bucket key below — and a running token sum assigns
    * `pack = floor(cum_before / budgetTokens)` — greedy
    * concat-and-cut, deterministic, one window exchange.
    *
    * Scale shape: one equi-join (docs ↔ cells, both keyed by id — at
    * 100 TB this is the payload exchange and co-partitions by id) and
    * the running-sum window DE-SKEWED over [[clampBucket]] gate
    * buckets with per-bucket token offsets, exactly as
    * [[curriculumOrder]] / [[composeMixture]] bound their windows
    * (r17 VERDICT — the plain (cell, subshard) window sorted a
    * dominant relatedness cell, one topic at 30% of a corpus, in ONE
    * task): each task sorts ≤ 1/1024 of a cell-subshard, and the
    * exclusive bucket token sum restores the exact running total.
    * The offset frame is (cells × subshards × ≤1024) rows with NO
    * broadcast hint — AQE broadcasts it at the parameter-sized k this
    * operator is used with, and at extreme k the join co-partitions
    * with the window exchange instead of forcing a multi-GB broadcast
    * (the hazard class the robots screen's fix closed the same
    * round). `subshards` remains available to split oversized cells'
    * PACKS, not their sorts. Subsharding and bucketing both keep
    * every pack inside a single cell — the semantic property.
    *
    * @return the input columns plus (n_tokens, cell, subshard, gate,
    *         pack) — `gate` is the in-pack order key;
    *         [[materializePacks]] consumes it via `orderCol`
    */
  def packRelated(
      docs: DataFrame, idCol: String, tokenCol: String,
      cells: DataFrame, cellIdCol: String, cellCol: String,
      budgetTokens: Long, subshards: Int = 1, salt: Int = 1,
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    require(subshards > 0, s"subshards must be positive: $subshards")
    val nTok = col(tokenCol).cast("long")
    // withColumn, not select: the caller's other columns (token arrays,
    // text) ride through to the pack assignment, as in [[packSequences]]
    // — [[materializePacks]] needs them on the same frame
    val guarded = docs.withColumn("n_tokens",
      when(nTok.isNull.or(nTok < 0),
        raise_error(concat(
          lit(s"packRelated: token column '$tokenCol' must be a non-negative count, got "),
          coalesce(nTok.cast("string"), lit("NULL")),
          lit(" for id "), col(idCol).cast("string"))))
        .otherwise(nTok))
    val withCell = guarded.join(
      cells.select(col(cellIdCol).as(idCol), col(cellCol).as("cell")),
      Seq(idCol))
      .withColumn("gate", idGate(col(idCol), salt))
      .withColumn("subshard",
        pmod(col("gate"), lit(subshards.toLong)).cast("int"))
      .withColumn("__b", clampBucket(col("gate"), 977L))
    val offs = bucketOffsets(withCell, Seq("cell", "subshard"),
      sum(col("n_tokens")))
    val w = Window.partitionBy("cell", "subshard", "__b")
      .orderBy(col("gate").asc, col(idCol).asc)
    withCell.join(offs, Seq("cell", "subshard", "__b"))
      .withColumn("__cum", sum(col("n_tokens")).over(w) + col("__off"))
      .withColumn("pack",
        floor((col("__cum") - col("n_tokens")).cast("double") / budgetTokens.toDouble)
          .cast("long"))
      .drop("__cum", "__b", "__off")
  }

  /** Materialize pack assignments ([[packSequences]] /
    * [[packRelated]]) into trainer-ready rows: ONE row per pack
    * carrying the concatenated token sequence (documents in the exact
    * order the packer's running sum consumed them) plus the doc
    * boundary offsets a trainer needs to reset attention across
    * document joins — the standard pretraining input shape (each
    * sequence is a concat of whole documents; cross-document attention
    * masked at the recorded boundaries).
    *
    * Scale shape: one hash aggregation on the pack key — the SAME
    * exchange a pack-keyed shard write needs anyway, so materializing
    * is free at the write. The per-row array lambdas (field
    * projection, flatten, the boundary prefix scan) operate on
    * PACK-sized arrays (≤ budget tokens by construction), bounded per
    * row regardless of corpus size — the repo's no-higher-order-
    * lambdas-in-corpus-scale-paths rule keys on per-element
    * re-evaluation of corpus-scale inputs, which a budget-bounded
    * array is not.
    *
    * @param packKeys     the packer's partition columns ("shard" for
    *                     [[packSequences]]; "cell", "subshard" for
    *                     [[packRelated]]) — with "pack" they identify
    *                     a pack
    * @param longestFirst true to concatenate in [[packSequences]]'s
    *                     fill order (n_tokens desc, id asc)
    * @param orderCol     name of the packer's order-key column —
    *                     [[packRelated]] callers pass "gate" so the
    *                     concat replays its (gate, id) fill order;
    *                     takes precedence over `longestFirst`
    * @return packKeys ++ (pack, n_docs, n_tokens, docs, doc_boundaries,
    *         token_ids) — doc_boundaries has n_docs+1 offsets, 0 first
    *         and the total last
    */
  def materializePacks(
      packed: DataFrame, packKeys: Seq[String], idCol: String,
      tokensCol: String, longestFirst: Boolean = false,
      orderCol: Option[String] = None,
  ): DataFrame = {
    val orderKey = orderCol.map(col(_).cast("long")).getOrElse(
      if (longestFirst) (-col("n_tokens")).cast("long") else lit(0L))
    val member = struct(
      orderKey.as("o"), col(idCol).as("id"), col(tokensCol).as("toks"))
    val keys = packKeys.map(col) :+ col("pack")
    packed
      .groupBy(keys: _*)
      .agg(sort_array(collect_list(member)).as("__m"))
      .select(keys ++ Seq(
        transform(col("__m"), m => m.getField("id")).as("docs"),
        flatten(transform(col("__m"), m => m.getField("toks")))
          .as("token_ids"),
        aggregate(
          transform(col("__m"), m => size(m.getField("toks")).cast("long")),
          array(lit(0L)),
          (acc, s) => concat(acc, array(element_at(acc, -1) + s)))
          .as("doc_boundaries")): _*)
      .withColumn("n_docs", size(col("docs")).cast("long"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .select(packKeys.map(col) ++ Seq(col("pack"), col("n_docs"),
        col("n_tokens"), col("docs"), col("doc_boundaries"),
        col("token_ids")): _*)
  }

  /** Domain-interleaved length curriculum (Bengio et al. 2009 framing;
    * length as the standard model-free difficulty proxy): docs are
    * ranked easy→hard WITHIN each domain, and the global training order
    * round-robins one doc per domain per cycle — so early training sees
    * short docs from every domain instead of whichever domain happens
    * to be shortest, and the mixture stays balanced at every prefix of
    * the curriculum.
    *
    * `order_idx = rank_in_domain · n_domains + domain_idx` is computed
    * per-row from a per-domain rank — there is NO global sort anywhere:
    * the only exchanges are the de-skewed (domain, difficulty-bucket)
    * rank window ([[clampBucket]] — each task sorts ≤ 1/1024 of a
    * domain) with its map-side bucket-count aggregate, and three
    * parameter-grained broadcasts (the distinct-domain index frame,
    * the bucket-offset frame, the 1-row domain count). The trainer materializes the
    * order by range-partitioning on order_idx at write time — a
    * property of the SINK, deliberately not baked in here.
    *
    * @return (doc, domain, difficulty, order_idx) — order_idx unique
    *         and ordered (gaps appear once smaller domains exhaust;
    *         consumers order by it, they don't index by it), difficulty
    *         the whitespace token count
    */
  def curriculumOrder(
      df: DataFrame, idCol: String, textCol: String, domainCol: String,
  ): DataFrame = {
    val base = df.select(col(idCol).as("doc"), col(domainCol).as("domain"),
      TextAnalysis.tokenCountWs(col(textCol)).cast("long").as("difficulty"))
      // de-skewed rank: difficulty-bucketed (unit 64, fine to 65k
      // tokens; longer docs clamp into the top bucket) so the rank
      // window partitions by (domain, bucket) — a skewed domain sorts
      // ≤ 1/1024 of itself per task, with the broadcast bucket offset
      // restoring the exact per-domain rank
      .withColumn("__b", clampBucket(col("difficulty"), 64L))
    // domain-grained frames: the single-partition rank window is over
    // #domains rows (the same 1-row/dim-grained broadcast posture every
    // operator here uses for parameter-sized state)
    val domains = base.select("domain").distinct()
      .withColumn("didx",
        (row_number().over(Window.orderBy("domain")) - 1).cast("long"))
    val nDomains = domains.agg(count(lit(1)).as("__ndom"))
    val offs = bucketOffsets(base, "domain", count(lit(1)))
    val byBucket = Window.partitionBy("domain", "__b")
      .orderBy(col("difficulty").asc, col("doc").asc)
    base.join(broadcast(domains), "domain")
      .join(broadcast(offs), Seq("domain", "__b"))
      .withColumn("rk",
        (row_number().over(byBucket) - 1).cast("long") + col("__off"))
      .crossJoin(broadcast(nDomains))
      .select(col("doc"), col("domain"), col("difficulty"),
        (col("rk") * col("__ndom") + col("didx")).as("order_idx"))
  }

  /** Contrastive training-pair mining — the dataset-construction step
    * for embedding/reranker training from weak supervision: positives
    * are the LSH-verified near-dup pairs (label 1, with their exact
    * Jaccard), negatives are hash-order-adjacent pairs inside gate
    * buckets (label 0) — the standard "sort by a random key, take
    * neighbors" negative sampler, made REPRODUCIBLE by the idGate and
    * scale-safe by bucketing (each rank window covers ~N/buckets rows,
    * partition-parallel, never a global sort). Accidental positives
    * are anti-joined out; negatives get the same exact-Jaccard
    * verification so the pair set ships with honest similarity labels.
    *
    * @return (doc_a, doc_b, jaccard, label) — docs with fewer than
    *         shingleK tokens have no shingle set and drop out of both
    *         sides (nothing to verify against)
    */
  def contrastivePairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.12, shingleK: Int = 3,
      numHashes: Int = 32, bands: Int = 16,
      buckets: Int = 16, salt: Int = 7,
  ): DataFrame = {
    val pos = Dedup.minhashNearDups(df, idCol, textCol, threshold, shingleK,
      numHashes, bands)
    val keyed = df.select(col(idCol).as("doc"))
      .withColumn("g", idGate(col("doc"), salt))
      .withColumn("bucket", pmod(col("g"), lit(buckets.toLong)))
    val ranked = keyed.withColumn("rn",
      row_number().over(Window.partitionBy("bucket").orderBy(col("g"), col("doc"))))
    val x = ranked.select(col("bucket"), col("rn"), col("doc").as("da"))
    val y = ranked.select(col("bucket"), (col("rn") - 1).as("rn"), col("doc").as("db"))
    val adj = x.join(y, Seq("bucket", "rn"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
    val negPairs = adj.join(pos.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")
    val sets = Dedup.shingleSets(df, idCol, textCol, shingleK)
    val neg = negPairs
      .join(sets.withColumnRenamed("sid", "doc_a").withColumnRenamed("sset", "set_a"), "doc_a")
      .join(sets.withColumnRenamed("sid", "doc_b").withColumnRenamed("sset", "set_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(Dedup.jaccard(col("set_a"), col("set_b")), 6).as("jaccard"),
        lit(0).as("label"))
    pos.select(col("doc_a"), col("doc_b"), col("jaccard"), lit(1).as("label"))
      .unionByName(neg)
  }

  /** Corpus snapshot diff: per-doc added / removed / changed / unchanged
    * status between two snapshots, by id and content hash — the
    * ingest-audit card every recrawl publishes (what changed since the
    * last crawl, before any expensive reprocessing runs on unchanged
    * docs). Contents compare by FNV-1a64 over UTF-8 bytes, so the diff
    * ships one 8-byte hash per doc per side, never the texts; the join
    * is a single id-keyed full outer (both sides hash-partition on the
    * SAME key — one co-partitioned shuffle each, no broadcast needed at
    * any scale).
    *
    * @return (doc, old_hash, new_hash, status)
    */
  def corpusDiff(
      oldDf: DataFrame, newDf: DataFrame, idCol: String, textCol: String,
  ): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(oldDf.sparkSession)
    def hashed(d: DataFrame, out: String) = d.select(col(idCol).as("doc"),
      graft.functions.GraftFunctions.fnv1a64(col(textCol)).as(out))
    hashed(oldDf, "old_hash").join(hashed(newDf, "new_hash"), Seq("doc"), "full_outer")
      .select(col("doc"), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
