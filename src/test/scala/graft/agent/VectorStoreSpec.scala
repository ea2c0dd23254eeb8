package graft.agent

import java.nio.file.Files
import graft.SparkSpec

/** Parquet-backed vector store: persistence round-trips across store
  * instances (the property the reference's persistent stores provide). */
class VectorStoreSpec extends SparkSpec {

  test("training survives a store restart via the parquet snapshot") {
    val dir = Files.createTempDirectory("graft-vstore").toString

    val store1 = new ParquetVectorStore(spark, dir)
    val qaIds = store1.addQuestionAnswer(
      Seq("top regions by revenue", "average account balance"),
      Seq("SELECT r_name FROM region", "SELECT avg(c_acctbal) FROM customer"))
    store1.addDocs(Seq("revenue is computed net of discounts"),
      metadatas = Some(Seq(Map("source" -> "handbook"))))
    assert(qaIds == Seq("qa-1", "qa-2"))

    // a NEW instance over the same path sees the trained memory
    val store2 = new ParquetVectorStore(spark, dir)
    assert(store2.qaCount == 2 && store2.docsCount == 1)
    val hits = store2.getRelevantQaDocuments("revenue of top regions", k = 1)
    assert(hits.size == 1)
    assert(hits.head.contains("SELECT r_name FROM region"))
    val docHits = store2.getRelevantDocs("how is revenue computed", k = 1)
    assert(docHits.head.metadata == Map("source" -> "handbook"))

    // new adds continue the shared id sequence (qa-1, qa-2, doc-3 so
    // far — identical to a never-restarted store) instead of colliding
    // with restored auto-ids
    val more = store2.addQuestionAnswer(Seq("q3"), Seq("SELECT 3"))
    assert(more == Seq("qa-4"))

    // deletes persist too
    store2.deleteDocs(None)
    val store3 = new ParquetVectorStore(spark, dir)
    assert(store3.docsCount == 0 && store3.qaCount == 3)
  }

  test("agent trained on a parquet store retrieves after restart") {
    val dir = Files.createTempDirectory("graft-vstore2").toString
    val engine = new graft.engine.Engine(spark, "target/graft-tmp/vstore-ds")
    engine.register("region", graft.Tables.load(spark, sf, "region"))

    val trainer = new Agent(engine, new FakeLlm(Seq("SELECT 1")),
      vectorstore = Some(new ParquetVectorStore(spark, dir)))
    trainer.train(
      queries = Some(Seq("list region names")),
      codes = Some(Seq("SELECT r_name FROM region ORDER BY r_name")))

    val llm = new FakeLlm(Seq("SELECT r_name FROM region ORDER BY r_name"))
    val fresh = new Agent(engine, llm,
      vectorstore = Some(new ParquetVectorStore(spark, dir)))
    fresh.chat("list region names")
    assert(llm.lastPrompt.exists(_.contains(
      "SELECT r_name FROM region ORDER BY r_name")))
    assert(llm.lastPrompt.exists(_.contains(
      "You can utilize these examples as a reference for generating SQL")))
  }

  test("driver-side bounds: retrieval k and prompt head rows are capped") {
    // README "Driver-side bounds": the served-engine story is auditable
    // because every driver-bound path raises rather than bulk-collecting
    val store = new InMemoryVectorStore(spark)
    store.addQuestionAnswer(Seq("q"), Seq("SELECT 1"))
    store.getRelevantQuestionAnswers("q", k = VectorStore.MaxK) // cap value legal
    val e1 = intercept[IllegalArgumentException](
      store.getRelevantQuestionAnswers("q", k = VectorStore.MaxK + 1))
    assert(e1.getMessage.contains("cap"))
    import graft.Tables
    val e2 = intercept[IllegalArgumentException](
      Serializer.serialize("region", Tables.load(spark, sf, "region"),
        headN = Serializer.MaxHeadRows + 1))
    assert(e2.getMessage.contains("cap"))
    // at the cap both succeed
    assert(Serializer.serialize("region", Tables.load(spark, sf, "region"),
      headN = Serializer.MaxHeadRows).contains("<head>"))
  }
}
