package graft.sources

import org.apache.spark.sql.DataFrame

/** JDBC source support (SURVEY S6).
  *
  * The READ path is `DatasetPlanBuilder.readSource`'s remote branch
  * (reference behavior: extensions/connectors/sql/pandasai_sql/__init__
  * .py:8-84 and data_loader/sql_loader.py:19-85 — connection dict →
  * engine-specific URL → table read): a schema.yaml remote source becomes
  * `spark.read.format("jdbc")` with every connection key forwarded, so
  * partitioned reads (`partitionColumn`/`numPartitions`/`lowerBound`/
  * `upperBound`) and `fetchsize` are exactly Spark's own scale knobs.
  *
  * This object holds the pieces the sandbox needs to exercise that branch
  * for real with NO server: Derby ships on Spark's classpath, so an
  * embedded (in-JVM, file-backed) database stands in for the remote
  * engine. Production use passes a real server URL through the same
  * schema surface; nothing here is Derby-specific except the test URL
  * helper.
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Embedded-Derby URL for a database under java.io.tmpdir.
    * `create=true` makes first boot idempotent. Derby's log is routed to
    * the same tmp area (derby.system.home must be set before the engine
    * boots, so do it on first use of this object).
    */
  def derbyUrl(dbName: String): String = {
    val tmp = sys.props("java.io.tmpdir")
    if (!sys.props.contains("derby.system.home"))
      sys.props("derby.system.home") = tmp
    s"jdbc:derby:$tmp/$dbName;create=true"
  }

  /** Seed a JDBC table from a DataFrame through Spark's own JDBC writer
    * (DROP+CREATE on overwrite; dialect does the type mapping). Small
    * fixture tables are coalesced to one partition so the embedded
    * database sees a single writer connection.
    */
  def seed(df: DataFrame, url: String, table: String,
      driver: String = DerbyDriver): Unit =
    df.coalesce(1).write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .mode("overwrite")
      .save()
}
