package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.engine.Engine
import graft.schema.{SemanticSchema, SourceDef}

/** S6 JDBC source exercised for real against embedded Derby (on Spark's
  * classpath) — the same readSource branch a server-backed postgres/mysql
  * schema takes, with the connection url/driver forwarded verbatim.
  */
class JdbcSpec extends SparkSpec {

  test("JDBC write + semantic-layer read round-trips rows and schema") {
    val url = Jdbc.derbyUrl("graft-jdbcspec-db")
    val nation = Tables.load(spark, sf, "nation")
    Jdbc.seed(nation, url, "nation_rt")

    val engine = new Engine(spark, "/root/repo/target/graft-tmp/jdbcspec-datasets")
    val schema = SemanticSchema(
      name = "nation_jdbc_rt",
      source = Some(SourceDef("postgres", table = Some("nation_rt"),
        connection = Map("url" -> url, "driver" -> Jdbc.DerbyDriver))))
    val back = engine.createFromSchema("graft/nation_jdbc_rt", schema)

    assert(back.columns.toSeq == nation.columns.toSeq)
    val want = nation.orderBy("n_nationkey").collect().map(_.toSeq)
    val got = back.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("JDBC source honors connection tuning keys (fetchsize) and reloads from yaml") {
    val url = Jdbc.derbyUrl("graft-jdbcspec-db")
    Jdbc.seed(Tables.load(spark, sf, "region"), url, "region_rt")
    val engine = new Engine(spark, "/root/repo/target/graft-tmp/jdbcspec-datasets")
    val schema = SemanticSchema(
      name = "region_jdbc_rt",
      source = Some(SourceDef("postgres", table = Some("region_rt"),
        connection = Map("url" -> url, "driver" -> Jdbc.DerbyDriver,
          "fetchsize" -> "100"))))
    engine.createFromSchema("graft/region_jdbc_rt", schema)
    // reload from the yaml on disk — proves connection maps survive the
    // schema round-trip, not just the in-memory object
    val re = engine.load("graft/region_jdbc_rt")
    assert(re.count() == 5)
    assert(re.where(col("r_regionkey") === 0).count() == 1)
  }
}
