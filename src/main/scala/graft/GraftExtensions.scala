package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring (SURVEY.md §4): registers the library's
  * native Catalyst expressions as SQL functions so `spark.sql` users get
  * them too, not just the Column API. Activated by
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession sets it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[functions.DotLong].getName, "dot_long"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_long(a, b) takes two arguments")
        functions.DotLong(children.head, children(1))
      }))
  }
}
