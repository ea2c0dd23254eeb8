package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def count(hay: String, needle: String): Long = {
    GraftFunctions.ensureRegistered(spark)
    Seq(hay).toDF("s")
      .select(GraftFunctions.countSubstr(col("s"), lit(needle)))
      .head().getLong(0)
  }

  test("non-overlapping occurrence counts match replace-and-measure") {
    assert(count("a the b the c", " the ") == 2L)
    assert(count("aaaa", "aa") == 2L) // non-overlapping: [0,2], not 3
    assert(count("", "x") == 0L)
    assert(count("abc", "") == 0L) // empty needle contract
    assert(count("abc", "abcd") == 0L)
    assert(count("ünïcode ünï", "ünï") == 2L) // multi-byte UTF-8 needle
  }

  test("codegen and interpreted paths agree; equals regexp_count on random inputs") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val cases = (0 until 200).map { _ =>
      val hay = (0 until rnd.nextInt(40)).map(_ => "ab ".charAt(rnd.nextInt(3))).mkString
      val needle = (1 to rnd.nextInt(3) + 1).map(_ => "ab ".charAt(rnd.nextInt(3))).mkString
      (hay, needle)
    }
    val df = cases.toDF("hay", "needle")
    val got = df.select(GraftFunctions.countSubstr(col("hay"), col("needle")))
      .collect().map(_.getLong(0)).toSeq
    val ref = cases.map { case (h, n) =>
      CountSubstr.count(h.getBytes("UTF-8"), n.getBytes("UTF-8"))
    }
    assert(got == ref)
    // and the reference itself equals java's non-overlapping scan via
    // replace-and-measure
    cases.foreach { case (h, n) =>
      if (n.nonEmpty) {
        val expected = (h.length - h.replace(n, "").length) / n.length
        assert(CountSubstr.count(h.getBytes("UTF-8"), n.getBytes("UTF-8")) == expected,
          s"hay='$h' needle='$n'")
      }
    }
  }

  test("null propagation") {
    GraftFunctions.ensureRegistered(spark)
    val out = Seq((null: String, "x")).toDF("h", "n")
      .select(GraftFunctions.countSubstr(col("h"), col("n")))
      .head()
    assert(out.isNullAt(0))
  }

  test("countWordsIn equals the per-word occurrence sum and the \\b regex count") {
    GraftFunctions.ensureRegistered(spark)
    val words = Seq("the", "and", "of")
    val rnd = new scala.util.Random(11)
    val vocab = Seq("the", "and", "of", "thee", "andor", "x", "of2", "a_b", "the_")
    val texts = (0 until 50).map(_ =>
      (0 until rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(Seq(" ", ", ", "-", "_", "  ")(rnd.nextInt(5))))
    val df = texts.toDF("t")
    val padded = concat(lit(" "),
      regexp_replace(lower(col("t")), "[^a-z0-9_]+", "  "), lit(" "))
    val rows = df.select(
      GraftFunctions.countWordsIn(padded, words).as("fast"),
      regexp_count(lower(col("t")),
        lit(words.mkString("\\b(", "|", ")\\b"))).cast("long").as("re"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch on '$t'")
    }
  }
}
