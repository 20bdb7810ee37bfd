package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{FloatVecDot, SimHashLong}

/** SQL surface for the library's custom Catalyst expressions
  * (`spark.sql("SELECT float_vec_dot(a, b) ...")`).
  *
  * Two registration paths:
  *   - at session build: `spark.sql.extensions=graft.GraftExtensions`
  *     or `.withExtensions(new GraftExtensions)`;
  *   - on a live session: `GraftExtensions.register(spark)` (the
  *     extensions mechanism only applies at build time).
  *
  * The DataFrame API reaches the same expressions through
  * `graft.functions.VectorFunctions.dotD` / `DedupOps`, so this is
  * surface parity for SQL-first callers, not new semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash_long"),
      new ExpressionInfo(classOf[SimHashLong].getName, "simhash_long"),
      GraftExtensions.simhashBuilder))
  }
}

object GraftExtensions {
  private[graft] val dotBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "float_vec_dot(a, b) takes two array<float> args")
    FloatVecDot(args(0), args(1))
  }

  private[graft] val simhashBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2,
      "simhash_long(tokens, bits) takes an array<string> and a literal bit width")
    val bits = args(1) match {
      case Literal(v: Int, _) => v
      case other => other.eval() match {
        case i: Int => i
        case _ => throw new IllegalArgumentException(
          "simhash_long bit width must be an integer literal")
      }
    }
    SimHashLong(args(0), bits)
  }

  /** Register both functions on a live session. */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "float_vec_dot", dotBuilder)
    GraftSqlBridge.registerFunction(spark, "simhash_long", simhashBuilder)
  }
}
