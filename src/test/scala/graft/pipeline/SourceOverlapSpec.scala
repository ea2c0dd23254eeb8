package graft.pipeline

import graft.SparkSpec

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  // src A: shingles {a b, b c};  src B: {b c, c d};  src C: {x y, y z}
  private lazy val out = Dedup.sourceOverlapMatrix(
    Seq(
      (1L, "A", "a b c"),
      (2L, "B", "b c d"),
      (3L, "C", "x y z")).toDF("doc_id", "source", "text"),
    "doc_id", "text", "source", k = 2)
    .orderBy("src_a", "src_b").collect()

  test("only overlapping pairs appear, with exact shared counts") {
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === ("A", "B"))
    assert(r.getLong(2) === 1L) // shared = {"b c"}
    assert(r.getLong(3) === 2L && r.getLong(4) === 2L)
  }

  test("containments are directed shares of each source's type set") {
    val r = out.head
    assert(r.getDouble(5) === 0.5)
    assert(r.getDouble(6) === 0.5)
  }

  test("duplicate shingles within a source count once (type semantics)") {
    val rows = Dedup.sourceOverlapMatrix(
      Seq(
        (1L, "A", "a b a b a b"), // type set {a b, b a}
        (2L, "B", "a b c")).toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", k = 2).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(2) === 1L) // only "a b" shared, once
  }
}
