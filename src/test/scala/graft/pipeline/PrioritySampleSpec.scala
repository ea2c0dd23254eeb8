package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private def frame(n: Int) =
    (1 to n).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "w")

  test("returns exactly k rows, deterministic across reruns and partitionings") {
    val a = Curation.prioritySample(frame(500), "id", "w", k = 20)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Curation.prioritySample(frame(500).repartition(13), "id", "w", k = 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a.length === 20)
    assert(a === b)
  }

  test("salt changes the draw") {
    val a = Curation.prioritySample(frame(500), "id", "w", k = 20)
      .select("id").as[Long].collect().toSet
    val b = Curation.prioritySample(frame(500), "id", "w", k = 20, salt = "#es2")
      .select("id").as[Long].collect().toSet
    assert(a !== b)
  }

  test("heavier rows are sampled more often (weight-proportionality)") {
    // two weight classes 10:1 — across many salts the heavy class must
    // dominate the sample
    val df = ((1 to 100).map(i => (i.toLong, 10L)) ++
      (101 to 200).map(i => (i.toLong, 1L))).toDF("id", "w")
    val heavyShare = (1 to 10).map { s =>
      val ids = Curation.prioritySample(df, "id", "w", k = 30, salt = s"#s$s")
        .select("id").as[Long].collect()
      ids.count(_ <= 100).toDouble / ids.length
    }.sum / 10
    assert(heavyShare > 0.7, s"heavy share was $heavyShare")
  }

  test("plan is TakeOrderedAndProject, not a global sort") {
    val plan = Curation.prioritySample(frame(100), "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("non-positive weight raises instead of vanishing") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Curation.prioritySample(df, "id", "w", k = 2).collect()
    }
    assert(e.getMessage.contains("prioritySample"), e.getMessage)
  }
}
