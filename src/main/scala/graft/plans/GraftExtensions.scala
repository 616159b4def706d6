package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.GraftFunctions

/** SparkSessionExtensions installer: makes every graft function available
  * to pure-SQL sessions at build time —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or, config-only (e.g. spark-submit / thrift server):
  * // --conf spark.sql.extensions=graft.plans.GraftExtensions
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  * }}}
  *
  * This is the injection point where custom `Rule[LogicalPlan]` /
  * `SparkStrategy` would also be registered; the reference surface needs
  * none (SURVEY §4.2) — the engine's only Catalyst-level artifacts are its
  * expressions, injected here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
}

object GraftExtensions {
  /** name → builder, shared with the session-level registry so the two
    * registration paths can never drift. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    GraftFunctions.functionBuilders
}
