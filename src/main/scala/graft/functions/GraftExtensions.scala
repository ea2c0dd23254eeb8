package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Declarative registration of graft's native expressions through the
  * standard extension point:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * makes `graft_fnv1a64`, `graft_count_substr`, `graft_count_words_in`,
  * `graft_max_dot`, and the `graft_kmv_kmins` aggregate available to
  * PURE-SQL sessions (thrift server, SQL notebooks, `spark.sql(...)`
  * with no Scala entry point) — the same deployment shape Iceberg and
  * Sedona use. Builders come from [[GraftFunctions.builders]], the one
  * table [[GraftFunctions.ensureRegistered]] also reads, so the
  * imperative and declarative paths register identical semantics by
  * construction.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftExtensions", name),
        builder))
    }
}
