package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.engine.SqlGate
import graft.plan.DatasetPlanBuilder
import graft.schema.TransformDef
import graft.transform.Transformations
import graft.types.Strftime

/** Property-based checks over the pure functions and, in one batched pass,
  * the transformation chain semantics (order sensitivity, null-safety).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling from a ScalaCheck generator (scalatestplus is
    * not in the offline cache, so we drive Gen directly). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("sanitizeTableName: idempotent, ≤64 chars, alphanumeric+underscore only") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val once = SqlGate.sanitizeTableName(s)
      assert(SqlGate.sanitizeTableName(once) == once)
      assert(once.length <= 64)
      assert(once.forall(c => c.isLetterOrDigit || c == '_'))
    }
  }

  test("strftime translation: known directives never leak bare letters") {
    val directive = Gen.oneOf("%Y", "%y", "%m", "%d", "%H", "%M", "%S", "%p", "%b", "%B")
    val literal = Gen.oneOf("-", "/", " ", ":", ".", "T", "at ")
    val fmtGen = Gen.listOfN(4, Gen.oneOf(directive, literal)).map(_.mkString)
    samples(fmtGen, 200).foreach { fmt =>
      val jt = Strftime.toJavaTime(fmt)
      // outside quoted runs, only java.time pattern letters may appear
      var inQuote = false
      val bare = jt.filter {
        case '\'' => inQuote = !inQuote; false
        case c if !inQuote && c.isLetter => true
        case _ => false
      }
      assert(bare.forall("yMdHmsaEDwxz".contains(_)), s"'$fmt' → '$jt' leaks: $bare")
    }
  }

  test("order_by injection strings fail to parse (reference corpus semantics)") {
    // Column construction is lazy in Spark 4 — parsing happens at plan
    // resolution, so force the sort into a plan
    val df = Seq(1, 2).toDF("created_at")
    val injections = Seq(
      "created_at; DROP TABLE users",
      "x DESC; DELETE FROM t",
      "a' OR '1'='1",
    )
    injections.foreach { s =>
      intercept[Exception] {
        df.orderBy(DatasetPlanBuilder.parseOrder(s)).collect()
      }
    }
    // and the legitimate shape still sorts
    assert(df.orderBy(DatasetPlanBuilder.parseOrder("created_at DESC"))
      .head().getInt(0) == 2)
  }

  test("transformation chains: null-safety and order sensitivity, batched") {
    // one Spark pass over a generated corpus instead of a job per case
    val values: Seq[Option[String]] =
      Seq(None, Some(""), Some("  x  "), Some("HeLLo WORLD"), Some("a'b\"c"),
        Some("x" * 200), Some("123"), Some("ünïcode"), Some(" trailing "))
    val df = values.map(v => Tuple1(v.orNull)).toDF("s")

    def run(ts: TransformDef*): Seq[Option[String]] = {
      val (d, e) = Transformations.applyColumn(df, "s", col("s"), ts,
        n => fail(s"unexpected resolve $n"))
      d.select(e.cast("string")).collect().map(r => Option(r.getString(0))).toSeq
    }
    val strip = TransformDef("strip", Map("column" -> "s"))
    val lowerT = TransformDef("to_lowercase", Map("column" -> "s"))
    val trunc = TransformDef("truncate", Map("column" -> "s", "length" -> 4))

    // null in → null out for every per-row transformation
    for (t <- Seq(strip, lowerT, trunc)) assert(run(t).head.isEmpty)
    // truncate bounds
    assert(run(trunc).flatten.forall(_.length <= 4))
    // strip∘truncate ≠ truncate∘strip on padded input (declaration order matters)
    val a = run(strip, trunc)
    val b = run(trunc, strip)
    assert(a != b)
    // lower∘strip == strip∘lower (independent ops commute)
    assert(run(lowerT, strip) == run(strip, lowerT))
  }

  test("jaccard stays within [0,1] and is 1 on identical sets, batched") {
    val gen = Gen.listOfN(8, Gen.alphaLowerStr.suchThat(_.nonEmpty))
    val texts = samples(gen, 30).map(_.mkString(" "))
    val df = texts.zip(texts.reverse).toDF("t1", "t2")
    val out = df.select(
      graft.pipeline.Dedup.jaccard(
        graft.pipeline.Dedup.shingles(col("t1"), 1),
        graft.pipeline.Dedup.shingles(col("t2"), 1)).as("j12"),
      graft.pipeline.Dedup.jaccard(
        graft.pipeline.Dedup.shingles(col("t1"), 1),
        graft.pipeline.Dedup.shingles(col("t1"), 1)).as("j11"))
      .collect()
    out.foreach { r =>
      val j12 = r.getDouble(0); val j11 = r.getDouble(1)
      assert(j12 >= 0.0 && j12 <= 1.0)
      assert(j11 == 1.0)
    }
  }

  test("chunkDocuments: coverage and reassembly hold on random corpora and window params") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val nDocs = 1 + rnd.nextInt(5)
      val docs = (1L to nDocs).map { i =>
        val n = rnd.nextInt(40) // 0..39 tokens
        (i, (1 to n).map(j => s"t${rnd.nextInt(9)}").mkString(" "))
      }
      val chunk = 1 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(chunk)
      val out = graft.pipeline.Curation.chunkDocuments(
        docs.toDF("doc_id", "text"), "doc_id", "text", chunk, stride)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getAs[Int]("chunk_idx"))).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) assert(!out.contains(id), s"trial $trial: token-less doc $id must be omitted")
        else {
          val rows = out(id)
          // expected starts: 0, stride, ... while < n
          val starts = 0 until toks.length by stride
          assert(rows.length == starts.length,
            s"trial $trial doc $id (n=${toks.length}, c=$chunk, s=$stride): ${rows.length} chunks, want ${starts.length}")
          rows.zip(starts).foreach { case (r, st) =>
            val want = toks.slice(st, st + chunk)
            assert(r.getAs[String]("chunk_text") == want.mkString(" "),
              s"trial $trial doc $id chunk at $st mismatch")
            assert(r.getAs[Long]("n_tokens") == want.length)
          }
          // every token index covered by at least one chunk
          val covered = starts.flatMap(st => st until math.min(st + chunk, toks.length)).toSet
          assert(covered == toks.indices.toSet, s"trial $trial doc $id: coverage gap")
        }
      }
    }
  }

  test("Fnv1a64 codegen matches the reference on arbitrary unicode strings") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val strs = samples(Gen.listOf(Gen.choose(0, 0x10FFFF)
      .suchThat(c => c < 0xD800 || c > 0xDFFF) // skip unpaired surrogates
      .map(Character.toChars(_).mkString)).map(_.mkString), 120)
      .distinct
    val got = strs.toDF("s")
      .select(graft.functions.GraftFunctions.fnv1a64(col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == strs.map(s => graft.functions.Fnv1a64.hash(s.getBytes("UTF-8"))))
  }

  test("Sessionize matches a brute-force reference on random event sets") {
    import java.sql.Timestamp
    val evGen = Gen.listOfN(60, for {
      u <- Gen.oneOf("a", "b", "c")
      off <- Gen.choose(0L, 72L * 3600)
    } yield (u, new Timestamp(1700000000000L + off * 1000L), 1.0))
    samples(evGen, 6).zipWithIndex.foreach { case (events, _) =>
      val df = events.toDF("u", "t", "v")
      val got = graft.operators.Sessionize.sessions(df, "u", "t", "2 hours")
        .select("u", "session_start", "n_events")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSet
      // reference: sort each key's times, split where diff >= gap
      val gapMs = 2L * 3600 * 1000
      val expected = events.groupBy(_._1).flatMap { case (u, evs) =>
        val ts = evs.map(_._2.getTime).sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (Nil, t) => List(List(t))
          case (cur :: rest, t) =>
            if (t - cur.head < gapMs) (t :: cur) :: rest
            else List(t) :: (cur :: rest)
        }
        sessions.map(sess => (u, sess.last, sess.length.toLong))
      }.toSet
      assert(got == expected)
    }
  }

  test("AsofJoin.backward matches a brute-force reference on random event sets") {
    import java.sql.Timestamp
    // duplicate timestamps on the LEFT are fine (each left row matches
    // independently); the right side is built unique per (key, ts) — the
    // operator's documented contract
    val evGen = for {
      left <- Gen.listOfN(25, for {
        u <- Gen.oneOf(1L, 2L, 3L)
        off <- Gen.choose(0L, 1000L)
        v <- Gen.choose(0, 99)
      } yield (u, off, v.toDouble))
      right <- Gen.listOfN(25, for {
        u <- Gen.oneOf(1L, 2L, 3L, 4L)
        off <- Gen.choose(0L, 1000L)
        v <- Gen.choose(100, 199)
      } yield (u, off, v.toDouble))
    } yield (left, right.distinctBy(r => (r._1, r._2)))
    samples(evGen, 6).foreach { case (left, right) =>
      val base = 1700000000000L
      val l = left.zipWithIndex
        .map { case ((u, off, v), i) => (i.toLong, u, new Timestamp(base + off * 1000L), v) }
      val ldf = l.toDF("event_id", "user_id", "ts", "value")
      val rdf = right
        .map { case (u, off, v) => (u * 10000 + off, u, new Timestamp(base + off * 1000L), v) }
        .toDF("event_id", "user_id", "ts", "value")
      val got = graft.operators.AsofJoin.backward(
        ldf.select("event_id", "user_id", "ts", "value"), rdf,
        leftKey = "user_id", rightKey = "user_id",
        leftTs = "ts", rightTs = "ts",
        rightCols = Map("value" -> "rv"))
        .select("event_id", "rv")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      // reference: per left row, the right row with max ts <= left ts
      // (inclusive), same key; None when no such row
      val expected = l.map { case (id, u, ts, _) =>
        val cands = right.filter(r => r._1 == u && base + r._2 * 1000L <= ts.getTime)
        id -> cands.sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == expected)
    }
  }

  test("tfidf matches a brute-force reference on random corpora") {
    val docGen = Gen.listOfN(8,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon"))
      .map(_.mkString(" "))
    samples(Gen.listOfN(12, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = graft.pipeline.TextAnalysis.tfidfTopTerms(df, "doc_id", "text", topN = 2)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4))).toSet
      // brute force: tokenize, tf per (doc, term), df per term, weight
      val tokenized = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val n = docs.size
      val dfreq = tokenized.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size)
      val expected = tokenized.flatMap { case (id, toks) =>
        toks.groupBy(identity).map { case (term, occ) =>
          val w = BigDecimal(occ.size * math.log((n + 1.0) / (dfreq(term) + 1.0)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, term, w)
        }.toSeq.sortBy { case (_, term, w) => (-w, term) }.take(2)
      }.toSet
      assert(got == expected)
    }
  }

  test("decontaminate: the blocklist docs themselves are always removed (k-token+ docs)") {
    val docGen = Gen.listOfN(10, Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6"))
      .map(_.mkString(" "))
    samples(Gen.listOfN(10, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // blocklist = the corpus itself: every doc (≥ k tokens) shares all
      // its shingles with the blocklist, so everything must be removed
      val clean = graft.pipeline.Dedup.decontaminate(
        docs, "doc_id", "text", docs, "doc_id", "text", shingleK = 3, minOverlap = 1)
      assert(clean.count() == 0)
    }
  }

  test("Excel roundtrip preserves random long/double/string frames") {
    val rowGen = for {
      id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      d <- Gen.choose(-1e12, 1e12)
      s <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('<', '&', '"', 'é', ' ')))
        .map(_.mkString)
    } yield (id, d, s)
    val rows = samples(Gen.listOfN(25, rowGen), 3)
    rows.zipWithIndex.foreach { case (data, i) =>
      val path = s"/root/repo/target/graft-tmp/prop-$i.xlsx"
      val df = data.toDF("id", "d", "s")
      graft.sources.Excel.write(df, path)
      val back = graft.sources.Excel.read(spark, path)
      val a = df.orderBy("id", "d", "s").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      val b = back.orderBy("id", "d", "s").collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          Option(r.getString(2)).getOrElse(""))).toSeq
      assert(a.map { case (x, y, z) => (x, y, z) } == b)
    }
  }

  test("de-skewed selection windows match the monolithic shape on random frames") {
    import org.apache.spark.sql.expressions.Window
    import graft.pipeline.Curation
    // random (id, domain, tokens) frames with random targets/budgets:
    // the clampBucket plan must select EXACTLY the rows the single
    // per-domain window would — the de-skew is a plan change only
    val rowGen = for {
      id <- Gen.chooseNum(0L, 5000L)
      dom <- Gen.oneOf("a", "b", "c", "skew", "skew", "skew", "skew")
      toks <- Gen.chooseNum(1L, 300L)
    } yield (id, dom, toks)
    val frameGen = Gen.listOfN(120, rowGen).map(_.distinctBy(_._1))
    samples(frameGen, 6).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("doc_id", "domain", "n_tokens")
      val target = 3L + i * 7
      // selection: deskewed operator vs monolithic reference
      val targets = df.select("domain").distinct()
        .withColumn("__target", lit(target))
      val got = Curation.selectTopPerDomain(
        df.select(col("doc_id"), col("domain")), "doc_id", targets)
        .select("doc").as[Long].collect().toSet
      val w = Window.partitionBy("domain")
        .orderBy(Curation.idGate(col("doc_id")), col("doc_id"))
      val want = df.withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= target).select("doc_id").as[Long].collect().toSet
      assert(got == want, s"select mismatch on sample $i")
      // token budget: same property for the running-sum window
      val budget = 200L + i * 150
      val gotB = Curation.sampleByTokenBudget(df, "doc_id", "n_tokens",
        "domain", budgets = Map.empty, defaultBudget = budget)
        .select("doc_id").as[Long].collect().toSet
      val wB = Window.partitionBy("domain")
        .orderBy(Curation.idGate(col("doc_id"), 2).asc, col("doc_id").asc)
      val wantB = df.withColumn("__cum",
        sum("n_tokens").over(wB) - col("n_tokens"))
        .where(col("__cum") < budget).select("doc_id").as[Long].collect().toSet
      assert(gotB == wantB, s"budget mismatch on sample $i")
    }
  }

  test("corpusDivergence: JS is symmetric, KL arguments swap") {
    import graft.pipeline.TextAnalysis
    val gen = Gen.listOfN(12,
      Gen.oneOf("red", "green", "blue", "cyan", "teal", "plum"))
    val corpora = samples(gen, 6).map(_.mkString(" "))
    corpora.grouped(2).collect { case Seq(x, y) => (x, y) }.foreach {
      case (x, y) =>
        val a = Seq((1L, x)).toDF("doc_id", "text")
        val b = Seq((1L, y)).toDF("doc_id", "text")
        val ab = TextAnalysis.corpusDivergence(a, "text", b, "text").head()
        val ba = TextAnalysis.corpusDivergence(b, "text", a, "text").head()
        // the divergence card must be order-consistent: swapping the
        // corpora swaps the KL directions and leaves JS unchanged
        assert(ab.getDouble(3) == ba.getDouble(3), s"JS asymmetric: $ab vs $ba")
        assert(ab.getDouble(1) == ba.getDouble(2) &&
          ab.getDouble(2) == ba.getDouble(1), s"KL swap broken: $ab vs $ba")
    }
  }

  test("normalizeUrl: idempotent over random messy URLs") {
    import graft.pipeline.Urls
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS")
    val host = Gen.oneOf("Host.Org", "www.X.io", "a.b.c", "UPPER.example.COM")
    val port = Gen.oneOf("", ":80", ":443", ":8080")
    val path = Gen.oneOf("", "/", "/P/q", "//x")
    val query = Gen.oneOf("", "?a=1", "?utm_source=x", "?a=1&&utm_b=2&c=3", "?&x=1")
    val frag = Gen.oneOf("", "#f", "#a#b")
    val urlGen = for {
      s <- scheme; h <- host; pt <- port; pa <- path; q <- query; f <- frag
    } yield s"$s://$h$pt$pa$q$f"
    val urls = samples(urlGen, 300)
    val out = urls.toDF("u")
      .select(Urls.normalizeUrl(col("u")).as("n1"))
      .select(col("n1"), Urls.normalizeUrl(col("n1")).as("n2"))
      .as[(String, String)].collect()
    out.foreach { case (n1, n2) =>
      assert(n1 == n2, s"normalizeUrl not idempotent: '$n1' → '$n2'")
      assert(!n1.contains("#") && !n1.matches(".*[?&]utm_[a-z0-9_]*=.*"),
        s"fragment or tracker survived: '$n1'")
    }
  }

  test("unicodeNormalize: idempotent per form; NFC∘NFD round-trips") {
    import graft.functions.GraftFunctions
    GraftFunctions.ensureRegistered(spark)
    val pool = "aA1 éé\u0301ﬁＡ①ß"
    val gen = Gen.listOfN(8, Gen.oneOf(pool.toSeq)).map(_.mkString)
    val strs = samples(gen, 200)
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { f =>
      val out = strs.toDF("s")
        .select(GraftFunctions.unicodeNormalize(col("s"), f).as("a"))
        .select(col("a"),
          GraftFunctions.unicodeNormalize(col("a"), f).as("b"))
        .as[(String, String)].collect()
      out.foreach { case (a, b) => assert(a == b, s"$f not idempotent on '$a'") }
    }
    // NFC(NFD(x)) == NFC(x): decomposition then composition is canonical
    val rt = strs.toDF("s").select(
        GraftFunctions.unicodeNormalize(
          GraftFunctions.unicodeNormalize(col("s"), "NFD"), "NFC").as("a"),
        GraftFunctions.unicodeNormalize(col("s"), "NFC").as("b"))
      .as[(String, String)].collect()
    rt.foreach { case (a, b) => assert(a == b) }
  }

  test("bpe decode inverts encode for any trained model on random corpora") {
    import graft.pipeline.{Bpe, Dedup, OperatorCache}
    val word = Gen.oneOf("the", "them", "theme", "ab", "abc", "x1", "Mixed", "PUNCT")
    val gen = Gen.listOfN(10, word).map(_.mkString(" "))
    val texts = samples(gen, 20)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", numMerges = 12)
    val got = Bpe.encode(docs, "doc_id", "text", m, wordEnd = "</w>")
      .select(col("doc"), Bpe.decodePieces(col("pieces"), "</w>").as("d"))
      .as[(Long, String)].collect().toMap
    val expected = docs.select(col("doc_id"),
        array_join(Dedup.tokensOf(col("text")), " "))
      .as[(Long, String)].collect().toMap
    expected.foreach { case (id, e) =>
      if (e.nonEmpty) assert(got(id) == e, s"doc $id: '${got(id)}' != '$e'")
    }
    OperatorCache.releaseAll(spark)
  }

  test("capPerStratum: never exceeds the cap, output ⊆ input, cap ≥ stratum size is identity") {
    import graft.pipeline.Curation
    val gen = Gen.listOfN(150, Gen.choose(0, 6))
    samples(gen, 3).zipWithIndex.foreach { case (strata, run) =>
      val df = strata.zipWithIndex
        .map { case (s, i) => (i.toLong + run * 1000, s"s$s") }.toDF("id", "k")
      val capped = Curation.capPerStratum(df, "id", "k", cap = 10)
        .as[(Long, String)].collect()
      val input = df.as[(Long, String)].collect().toSet
      assert(capped.toSet.subsetOf(input))
      capped.groupBy(_._2).foreach { case (k, rows) =>
        assert(rows.length <= 10, s"stratum $k over cap: ${rows.length}") }
      val identity = Curation.capPerStratum(df, "id", "k", cap = 1000)
        .as[(Long, String)].collect().toSet
      assert(identity == input, "cap above every stratum size must be identity")
    }
  }

  test("concentration: gini ∈ [0, 1), uniform = 0, invariant under key renaming") {
    import graft.pipeline.Profiling
    val gen = Gen.listOfN(120, Gen.choose(0, 9))
    samples(gen, 5).foreach { ks =>
      val df = ks.zipWithIndex.map { case (k, i) => (i, s"k$k") }.toDF("i", "key")
      val r = Profiling.concentration(df, "key").head()
      val gini = r.getDouble(3)
      assert(gini >= 0.0 && gini < 1.0, s"gini out of range: $gini")
      // renaming keys (a bijection) must not change the card
      val renamed = df.withColumn("key", concat(lit("zz_"), col("key")))
      assert(Profiling.concentration(renamed, "key").head() == r)
    }
  }
}
