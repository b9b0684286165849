package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` installer (SURVEY §7.3's
  * "custom Catalyst pieces" hook): registers native expressions under
  * SQL-callable names. Activate either way:
  *
  *  - `SparkSession.builder.withExtensions(new GraftExtensions)`, or
  *  - `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *
  * Library code never requires it — call sites probe
  * `spark.catalog.functionExists` and fall back to the composable
  * built-in form, so the engine works on an untouched session too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(args.head, args(1))
      }))
}
