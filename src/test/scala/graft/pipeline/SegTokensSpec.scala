package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the native single-pass tokenizer ([[graft.functions.SegTokens]],
  * what [[Dedup.segTokensOf]] compiles to) EXACTLY equal to the
  * three-regex executable specification [[Dedup.segTokensOfRegex]] —
  * the form the DuckDB oracles replay, so this equality is what keeps
  * the DuckDB ≡ Spark parity chain closed after the fusion. */
class SegTokensSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
        Dedup.segTokensOf(col("text")).as("native"),
        Dedup.segTokensOfRegex(col("text")).as("regex"),
        Dedup.segSplitOf(col("text")).as("vnative"),
        Dedup.segSplitOfRegex(col("text")).as("vregex"),
        Dedup.tokensOf(col("text")).as("lnative"),
        Dedup.tokensOfRegex(col("text")).as("lregex"))
      .as[(Long, Seq[String], Seq[String], Seq[String], Seq[String],
        Seq[String], Seq[String])]
      .collect()
    rows.foreach { case (id, native, regex, vnative, vregex, ln, lr) =>
      assert(native == regex,
        s"native != regex for input ${texts(id.toInt).take(80)}: " +
          s"$native vs $regex")
      assert(vnative == vregex,
        s"verbatim native != regex for input ${texts(id.toInt).take(80)}: " +
          s"$vnative vs $vregex")
      assert(ln == lr,
        s"latin native != regex for input ${texts(id.toInt).take(80)}: " +
          s"$ln vs $lr")
    }
  }

  test("native tokenizer equals the regex spelling on the hand fixtures") {
    both(Seq(
      "", " ", "\t\n\r\f", "plain ascii words 123",
      "  leading and trailing   ",
      "UPPER Case MiXeD", "punct!don't,strip;these(joins)runs",
      "Spark引擎は高速です and very fast",
      "ภาษาไทยไม่มีช่องว่าง between words",
      "深度学习模型训练数据 mixed 管道 pipeline 123",
      "カタカナとひらがな混在のテキスト",
      "ភាសាខ្មែរ khmer", "မြန်မာဘာသာ myanmar", "བོད་སྐད་ tibetan",
      new String(Character.toChars(0x20000)) + "ext-b" +
        new String(Character.toChars(0x2000B)),
      // casing edge cases: Kelvin sign lowers INTO a-z; İ expands to
      // i+combining dot under full-string lowercasing; Σ has a
      // context-sensitive final form; ß stays itself (stripped)
      "K elvin and İstanbul ΣΟΦΟΣ straße STẞ",
      // non-ASCII whitespace (NBSP) is NOT a separator — it joins runs
      "a b c", "émigré café naïve",
      "হিন্দি বাংলা देवनागरी عربى кириллица ελληνικά",
      "🚀 emoji 😀 and ﬀ ligatures 𝕏"))
  }

  test("native tokenizer equals the regex spelling on a random mixed-script sweep") {
    val alphabet: IndexedSeq[String] =
      ((('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).map(_.toString) ++
        Seq(" ", " ", "\t", "\n", ".", ",", "!", "#", "'", "-", "_",
          "é", "ß", "Å", "K", "İ", "Σ", "σ", "ς", " ",
          "中", "文", "学", "習", "の", "は", "カ", "ナ",
          "ไ", "ท", "ย", "ລ", "າ", "ក", "ខ", "မ", "န", "ཀ", "ཁ", "་",
          "ﬀ", "😀", "🚀", "𝕏",
          new String(Character.toChars(0x20000)),
          new String(Character.toChars(0x2000B)))).toIndexedSeq
    val rnd = new scala.util.Random(20)
    val texts = (1 to 200).map { _ =>
      val len = rnd.nextInt(40)
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    both(texts)
  }

  test("native tokenizer stays inside whole-stage codegen") {
    // a non-foldable source (range), or constant folding evaluates the
    // expression at plan time and leaves nothing to codegen
    val df = spark.range(8)
      .select(size(Dedup.segTokensOf(
        concat(lit("codegen check 深度 "), col("id")))).as("n"))
    // executedPlan.toString marks codegen stages with a "*(n)" prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [size(graft_seg_tokens("),
      s"seg tokenizer must not break codegen:\n${plan.take(600)}")
    assert(df.as[Int].collect().forall(_ == 5))
  }
}
