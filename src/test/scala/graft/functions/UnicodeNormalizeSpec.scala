package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String = {
    GraftFunctions.ensureRegistered(spark)
    Seq(s).toDF("s")
      .select(GraftFunctions.unicodeNormalize(col("s"), form))
      .head().getString(0)
  }

  test("the four forms on the canonical composition cases") {
    val decomposed = "café" // e + combining acute
    assert(norm(decomposed, "NFC") == "café")
    assert(norm("café", "NFD") == decomposed)
    assert(norm("ﬁle ﬀort", "NFC") == "ﬁle ﬀort",
      "ligatures are canonical — NFC must keep them")
    assert(norm("ﬁle ﬀort", "NFKC") == "file ffort")
    assert(norm("Ａ１ｂ", "NFKC") == "A1b") // fullwidth forms
    assert(norm("①②", "NFKC") == "12")        // circled digits
    assert(norm("", "NFC") == "")
    intercept[IllegalArgumentException](UnicodeNormalize.formOf("NFX"))
  }

  test("codegen and interpreted paths agree with java.text.Normalizer on random strings") {
    GraftFunctions.ensureRegistered(spark)
    val pool = "aééﬁＡ xyz①"
    val rnd = new scala.util.Random(11)
    val cases = (0 until 300).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => pool.charAt(rnd.nextInt(pool.length))).mkString)
    val df = cases.toDF("s")
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { f =>
      val got = df.select(GraftFunctions.unicodeNormalize(col("s"), f))
        .collect().map(_.getString(0)).toSeq
      val ref = cases.map(Normalizer.normalize(_, Normalizer.Form.valueOf(f)))
      assert(got == ref, s"form $f diverged from java.text.Normalizer")
    }
    // nulls pass through as nulls
    val n = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.unicodeNormalize(col("s"), "NFC")).head()
    assert(n.isNullAt(0))
  }

  test("ASCII fast path returns the input untouched in both paths") {
    // interpreted entry point: the fast path must not allocate a copy
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii")
    assert(UnicodeNormalize.isAscii(u))
    assert(!UnicodeNormalize.isAscii(
      org.apache.spark.unsafe.types.UTF8String.fromString("café")))
    assert(norm("plain ascii text 123", "NFKC") == "plain ascii text 123")
  }
}
