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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(child) => KmvSketchAgg(child).toAggregateExpression()
        case Seq(child, kExpr) =>
          // k must be a non-null integer literal — anything else should
          // fail analysis with a readable message, not an internal
          // NPE/ClassCastException from eval()
          val k = kExpr match {
            case e if e.foldable => e.eval() match {
              case n: java.lang.Number => n.intValue()
              case other => throw new IllegalArgumentException(
                s"kmv_sketch: k must be an integer literal, got $other")
            }
            case _ => throw new IllegalArgumentException(
              "kmv_sketch: k must be a literal, not a column")
          }
          KmvSketchAgg(child, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "kmv_sketch takes 1 or 2 arguments: kmv_sketch(col[, k])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch"),
      (args: Seq[Expression]) => {
        def lit(e: Expression, what: String): Int = e match {
          case x if x.foldable => x.eval() match {
            case n: java.lang.Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"cms_sketch: $what must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"cms_sketch: $what must be a literal, not a column")
        }
        args match {
          case Seq(child) => CmsSketchAgg(child).toAggregateExpression()
          case Seq(child, d, w) =>
            CmsSketchAgg(child, lit(d, "depth"), lit(w, "width")).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "cms_sketch takes 1 or 3 arguments: cms_sketch(col[, depth, width])")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cms_estimate takes exactly 2 arguments")
        CmsEstimate(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "word_ngrams takes exactly 2 arguments: word_ngrams(text, n)")
        val n = args(1) match {
          case e if e.foldable => e.eval() match {
            case num: java.lang.Number => num.intValue()
            case other => throw new IllegalArgumentException(
              s"word_ngrams: n must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "word_ngrams: n must be a literal, not a column")
        }
        WordNgrams(args.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("qsample_sketch"),
      new ExpressionInfo(classOf[QSampleSketchAgg].getName, "qsample_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(id, value) => QSampleSketchAgg(id, value).toAggregateExpression()
        case Seq(id, value, kExpr) =>
          val k = kExpr match {
            case e if e.foldable => e.eval() match {
              case n: java.lang.Number => n.intValue()
              case other => throw new IllegalArgumentException(
                s"qsample_sketch: k must be an integer literal, got $other")
            }
            case _ => throw new IllegalArgumentException(
              "qsample_sketch: k must be a literal, not a column")
          }
          QSampleSketchAgg(id, value, k).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "qsample_sketch takes 2 or 3 arguments: qsample_sketch(id, value[, k])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("qsample_merge"),
      new ExpressionInfo(classOf[QSampleMergeAgg].getName, "qsample_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "qsample_merge takes exactly 1 argument")
        QSampleMergeAgg(args.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("qsample_quantile"),
      new ExpressionInfo(classOf[QSampleQuantile].getName, "qsample_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "qsample_quantile takes exactly 2 arguments")
        QSampleQuantile(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_card"),
      new ExpressionInfo(classOf[KmvCardinality].getName, "kmv_card"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "kmv_card takes exactly 1 argument")
        KmvCardinality(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_intersect"),
      new ExpressionInfo(classOf[KmvIntersect].getName, "kmv_intersect"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_intersect takes exactly 2 arguments")
        KmvIntersect(args.head, args(1))
      }))
  }
}
