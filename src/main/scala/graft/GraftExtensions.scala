package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.HashExpressions.{RollingHash64, SimHash64, WordShingles}
import graft.functions.VectorExpressions.HyperplaneBucketExpr

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so pure-SQL users (spark.sql / thrift / notebooks) get the
  * same codegen'd primitives as the Scala API:
  *
  *   SELECT rolling_hash64(text), simhash64(tokens),
  *          word_shingles(tokens, 3), hyperplane_bucket(vec, 12, 7) ...
  *
  * Activate with:
  *   SparkSession.builder().withExtensions(new GraftExtensions) — or
  *   spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

    def intArg(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (args: Seq[Expression]) => RollingHash64(args.head)))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args.head, intArg(args(1), "shingle size k"))))

    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "hyperplane_bucket"),
      (args: Seq[Expression]) => HyperplaneBucketExpr(args.head,
        intArg(args(1), "nPlanes"),
        if (args.size > 2) intArg(args(2), "seed") else 7)))
  }
}
