package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.plans.MinHashSignature

/** SparkSessionExtensions entry point: registers this engine's native
  * Catalyst expressions as SQL functions. Usable two ways:
  *
  *   - config: `spark.sql.extensions=graft.GraftExtensions`
  *   - runtime: `GraftExtensions.register(spark)` (idempotent) for
  *     sessions the caller doesn't configure — how the driver-contract
  *     queries attach to the provided session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.minhashFunction)
}

object GraftExtensions {

  private val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
    (args: Seq[Expression]) => {
      require(args.size == 2, "graft_minhash(shingles, k)")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case other => sys.error(s"graft_minhash k must be an int literal, got $other")
      }
      MinHashSignature(args.head, k)
    })

  /** Idempotent runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = minhashFunction
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    if (!registry.functionExists(ident))
      registry.registerFunction(ident, info, builder)
  }
}
