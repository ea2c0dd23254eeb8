package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The canonical corpus → training-data flow, composed from this
  * package's operators in the published pipeline order (C4 / Gopher /
  * RefinedWeb lineage): quality floors → rule screens →
  * decontamination → near-dup dedup → span surgery → reproducible
  * split. One entry point so a user gets the whole flow with one call
  * while every stage stays individually available (and individually
  * oracle-checked) — composition here is frame-to-frame, nothing is
  * re-implemented.
  *
  * Every stage is DECLARATIVE: the composed result is one lazy plan
  * per stage boundary, shuffles only where the member operators
  * shuffle (their scaladocs carry the per-operator scale shapes), and
  * the whole flow inherits the OperatorCache lifecycle — call
  * `OperatorCache.releaseAll` after materializing the result.
  *
  * Stage boundaries are deliberately NOT persisted, by measurement:
  * `cleaned` and `screened` each feed two consumers (a rule/postings
  * aggregate + the id-keyed join back), but the expensive subtrees
  * inside them — the scored corpus, the banded signatures, the
  * shingle postings — are already materialized by the member
  * operators, so the "recomputed" second consumption is mostly cache
  * reads plus cheap joins. A/B at sf0.1 (ProfileJobs p49, warm run):
  * baseline 12.6s, lazy-persisted boundaries 15.4s, count-materialized
  * boundaries 16.9s — the extra cache writes and barriers cost more
  * than the recompute they avoid. Re-measure before re-adding if the
  * stage mix changes.
  */
object TrainingPipeline {

  /** @param minQuality   [[TextAnalysis.qualityScore]] floor (0 disables)
    * @param languages    language allowlist; empty keeps all
    * @param minWords     Gopher word-count floor (0 disables the rule
    *                     screen entirely)
    * @param minStopwordHits floor for the Gopher ENGLISH stopword rule
    *                     (hits of the/be/to/of/and/that/have/with). −1 =
    *                     auto: 2 when the language allowlist is
    *                     English-only (the Gopher default), 0 — rule
    *                     disabled — otherwise, because on a multilingual
    *                     corpus the English-word test would silently
    *                     drop most non-English docs at the rule stage
    *                     (the rest of the screen is language-neutral)
    * @param blocklist    optional (frame, idCol, textCol) to fuzzy-
    *                     decontaminate against (exact inverted-index
    *                     Jaccard for eval-sized blocklists, banded LSH +
    *                     exact Jaccard above the size bound —
    *                     ≥ deconThreshold either way)
    * @param deconThreshold Jaccard threshold for the blocklist screen
    * @param dedupThreshold near-dup dedup threshold (≥ 1.0 disables)
    * @param spanK        cross-doc shared-span window (0 disables);
    *                     also used for the within-doc repeat window
    * @param splits       [[Curation.splitCorpus]] weights; empty
    *                     disables the split column
    * @param seenFilter   optional (bitmap, numBits, k) from
    *                     [[BloomGate.build]] over an already-ingested
    *                     corpus: docs the filter flags are dropped
    *                     BEFORE any scoring — a map-only pre-gate, the
    *                     cheapest stage, so it runs first (recrawl
    *                     ingest shape). None disables.
    * @param minEntropy / maxTopCharFrac gibberish screen thresholds
    *                     ([[TextAnalysis.entropySignals]] `suspect`
    *                     rule); minEntropy ≤ 0 disables the stage
    * @return (idCol, textCol, split?) — text rewritten by the span
    *         surgery stages when enabled
    */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3,
      languages: Set[String] = Set.empty,
      minWords: Long = 40,
      minStopwordHits: Long = -1L,
      blocklist: Option[(DataFrame, String, String)] = None,
      deconThreshold: Double = 0.7,
      dedupThreshold: Double = 0.8,
      spanK: Int = 8,
      splits: Seq[(String, Double)] = Seq(
        "train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      seenFilter: Option[(Array[Long], Int, Int)] = None,
      minEntropy: Double = 0.0,
      maxTopCharFrac: Double = 0.25,
  ): DataFrame = {
    // 0a. Bloom ingest pre-gate: drop docs already ingested yesterday —
    //     map-only (no join/shuffle), so it runs before anything that
    //     costs an exchange. Sound: no false negatives, so nothing
    //     previously ingested survives; deterministic false positives
    //     only ever drop extra docs, never corrupt the stream.
    val gated = seenFilter match {
      case Some((bitmap, numBits, k)) =>
        BloomGate.probe(docs, textCol, bitmap, numBits, k, "__seen")
          .where(!col("__seen")).drop("__seen")
      case None => docs
    }

    // 0b. gibberish screen: entropy/top-char `suspect` rule, id-keyed
    //     semi-join on the signals frame (the signals aggregate is the
    //     only exchange)
    val legible =
      if (minEntropy <= 0) gated
      else gated.join(
        TextAnalysis.entropySignals(gated, idCol, textCol,
          minEntropy = minEntropy, maxTopFrac = maxTopCharFrac)
          .where(!col("suspect")).select(col("doc").as("__legible_doc")),
        gated(idCol) === col("__legible_doc"), "left_semi")

    // 1. quality floor + language allowlist + near-dup dedup — the
    //    composed cleanCorpus stage (one scoring pass, banded dedup)
    val cleaned = TextAnalysis.cleanCorpus(legible, idCol, textCol,
      minQuality = minQuality, languages = languages,
      dedupThreshold = dedupThreshold)

    // 2. Gopher rule screen: keep docs passing every rule (semi-join on
    //    the rule frame — the rules are map-only, the join is id-keyed).
    //    The stopword rule is English-specific, so it only arms itself
    //    when the allowlist guarantees an English corpus (see param doc).
    val stopHits =
      if (minStopwordHits >= 0) minStopwordHits
      else if (languages.nonEmpty && languages.subsetOf(Set("en"))) 2L
      else 0L
    val screened =
      if (minWords <= 0) cleaned
      else cleaned.join(
        TextAnalysis.gopherQualityRules(cleaned, idCol, textCol,
          minWords = minWords, minStopwordHits = stopHits)
          .where(col("pass")).select(col("doc").as("__pass_doc")),
        cleaned(idCol) === col("__pass_doc"), "left_semi")

    // 3. fuzzy decontamination against the eval blocklist
    val decontaminated = blocklist match {
      case Some((bl, bId, bText)) =>
        Dedup.fuzzyDecontaminate(screened, idCol, textCol,
          bl, bId, bText, threshold = deconThreshold)
      case None => screened
    }

    // 4. span surgery: cut cross-doc boilerplate, then within-doc
    //    repetition, over the surviving docs; the operators emit
    //    (doc, text_clean, ...) — fold the rewritten text back under
    //    the caller's column names
    val surgered =
      if (spanK <= 0) decontaminated
      else {
        val cross = Dedup.removeSharedSpans(
          decontaminated, idCol, textCol, k = spanK)
          .select(col("doc").as(idCol), col("text_clean").as(textCol))
        Dedup.removeRepeatedSpans(cross, idCol, textCol, k = spanK)
          .select(col("doc").as(idCol), col("text_clean").as(textCol))
      }
    val projected =
      if (spanK <= 0) surgered.select(col(idCol), col(textCol))
      else surgered

    // 5. reproducible split
    if (splits.isEmpty) projected
    else Curation.splitCorpus(projected, idCol, splits)
  }
}
