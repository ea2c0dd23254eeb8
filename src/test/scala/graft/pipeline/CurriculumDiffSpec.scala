package graft.pipeline

import graft.SparkSpec

/** Curriculum-order and snapshot-diff contracts. */
class CurriculumDiffSpec extends SparkSpec {
  import spark.implicits._

  test("curriculumOrder: unique indices, round-robin interleave, easy first") {
    // two domains, known lengths: a1(2 words) a2(4) / b1(3) b2(5)
    val docs = Seq(
      (1L, "w w", "a"), (2L, "w w w w", "a"),
      (3L, "w w w", "b"), (4L, "w w w w w", "b"),
    ).toDF("doc_id", "text", "source")
    val out = Curation.curriculumOrder(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // didx: a=0, b=1; cycle 0 = easiest per domain
    assert(out(1L) == (("a", 2L, 0L)))
    assert(out(3L) == (("b", 3L, 1L)))
    assert(out(2L) == (("a", 4L, 2L)))
    assert(out(4L) == (("b", 5L, 3L)))
    assert(out.values.map(_._3).toSet.size == 4, "order_idx must be unique")
  }

  test("curriculumOrder: difficulty ties break by doc id within a domain") {
    val docs = Seq((9L, "x y", "a"), (2L, "x y", "a")).toDF("doc_id", "text", "source")
    val out = Curation.curriculumOrder(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(2L) < out(9L), s"min id first on equal difficulty: $out")
  }

  test("curriculumOrder: unequal domains keep unique, ordered positions") {
    val docs = (0L until 30L).map(i =>
      (i, ("w " * (1 + (i % 7).toInt)).trim, if (i % 3 == 0) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.curriculumOrder(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).distinct.length == 30, "order_idx collision")
    // within each domain, order_idx increases with (difficulty, doc)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq,
        "difficulty must be non-decreasing along the curriculum within a domain")
    }
  }

  test("corpusDiff: all four statuses, hash-exact") {
    val oldS = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("doc_id", "text")
    val newS = Seq((1L, "same"), (2L, "changed now"), (4L, "brand new")).toDF("doc_id", "text")
    val out = Curation.corpusDiff(oldS, newS, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("corpusDiff: hashes are FNV-1a64 over UTF-8 bytes") {
    val oldS = Seq((1L, "héllo")).toDF("doc_id", "text")
    val out = Curation.corpusDiff(oldS, oldS, "doc_id", "text").collect().head
    val expected = graft.functions.Fnv1a64.hash(
      "héllo".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(out.getLong(1) == expected && out.getLong(2) == expected)
    assert(out.getString(3) == "unchanged")
  }
}
