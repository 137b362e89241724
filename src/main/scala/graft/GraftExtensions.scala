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

    // wrong arg counts fail at analysis time (ANALYSIS-grade error, not a
    // runtime NoSuchElementException deep in planning); wrong arg TYPES are
    // rejected by each expression's ExpectsInputTypes check
    def arity(name: String, args: Seq[Expression], lo: Int,
        hi: Int): Unit =
      if (args.size < lo || args.size > hi) {
        val want = if (lo == hi) s"$lo" else s"$lo to $hi"
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> want,
            "actualNum" -> args.size.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }

    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (args: Seq[Expression]) => {
        arity("rolling_hash64", args, 1, 1)
        RollingHash64(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1, 1)
        SimHash64(args.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        arity("word_shingles", args, 2, 2)
        WordShingles(args.head, intArg(args(1), "shingle size k"))
      }))

    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "hyperplane_bucket"),
      (args: Seq[Expression]) => {
        arity("hyperplane_bucket", args, 2, 3)
        HyperplaneBucketExpr(args.head,
          intArg(args(1), "nPlanes"),
          if (args.size > 2) intArg(args(2), "seed") else 7)
      }))

    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(
        classOf[graft.operators.ZOrder.InterleaveBits].getName,
        "interleave_bits"),
      (args: Seq[Expression]) => {
        arity("interleave_bits", args, 2, 2)
        graft.operators.ZOrder.InterleaveBits(args.head,
          intArg(args(1), "bits per column"))
      }))

    // SQL writes: INSERT INTO/OVERWRITE and MERGE INTO against graft
    // tables are converted to snapshot-log commands (Spark's generic
    // HadoopFsRelation insert would write parquet into the table dir
    // WITHOUT a commit — rows invisible to readers and orphan-collected;
    // v1 relations have no MERGE support at all). Unsupported write
    // shapes fail loudly inside the rule instead of corrupting.
    ext.injectPostHocResolutionRule(new graft.sql.GraftSqlRule(_))

    // SELECT ... FROM t VERSION AS OF n / TIMESTAMP AS OF '...' — v1
    // relations have no time-travel support, so resolve the snapshot
    // ourselves through the graft source's snapshotId option. Injected
    // into the HINTS batch, which runs BEFORE the Resolution batch —
    // the builtin ResolveRelations would otherwise reject time travel
    // on a v1 relation before any extension resolution rule fires.
    ext.injectHintResolutionRule(new graft.sql.GraftTimeTravelRule(_))

    // ALTER TABLE DROP COLUMN[S] / RENAME COLUMN are v2-only statements
    // the Resolution batch would reject on v1 tables — intercept them in
    // the HINTS batch (drop → evolve commit; rename → loud refusal).
    ext.injectHintResolutionRule(new graft.sql.GraftAlterRule(_))

    // CALL graft.<maintenance procedure>(...) — Spark parses CALL but
    // only v2 ProcedureCatalogs resolve it; convert in the HINTS batch.
    ext.injectHintResolutionRule(new graft.sql.GraftProcedureRule(_))

    // SELECT COUNT(*) FROM <graft table> answers from the snapshot
    // log's per-file row counts (manifest metadata) instead of a scan,
    // when provably scan-equivalent — see GraftCountStarRule.
    ext.injectOptimizerRule(new graft.sql.GraftCountStarRule(_))

    // SELECT COUNT(*) FROM <registered FOREIGN Iceberg view> answers
    // from the foreign tree's manifests (minus exactly-applying
    // position tombstones) instead of the MOR scan — the reference's
    // headline external-engine check. Post-hoc resolution: the match
    // is by stored-view plan identity, which optimization would erase.
    ext.injectPostHocResolutionRule(new graft.sql.GraftForeignCountRule(_))
  }
}
