package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * registers the native vector expressions as SQL functions so the
  * `spark.sql` entry point (SURVEY S6) reaches them too — the
  * DataFrame API goes through [[VectorExprs]] directly and needs no
  * registration.
  *
  *  - `array_dot(a, b)`        → double
  *  - `array_decimal_dot(a,b)` → decimal(38,18), exact
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProducts)
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_dot takes 2 arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_decimal_dot"),
      new ExpressionInfo(classOf[ArrayDecimalDotProduct].getName, "array_decimal_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_decimal_dot takes 2 arguments")
        ArrayDecimalDotProduct(children.head, children(1))
      }))
  }
}
