package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Java-callable entry points for the native expressions' codegen.
  *
  * Generated Java (Janino) can only resolve STATIC methods, and only
  * top-level Scala objects get static forwarders in their mirror class —
  * a nested `object RollingHash64` inside `HashExpressions` compiles to
  * `HashExpressions$RollingHash64$` with instance methods only, so codegen
  * strings referencing it fail to compile and Spark silently falls back to
  * interpreted execution for the whole stage (caught empirically: javac
  * cannot resolve the nested form). Every doGenCode must target THIS
  * object.
  */
object NativeOps {

  def rollingHash64(bytes: Array[Byte]): Long =
    HashExpressions.RollingHash64.hash(bytes)

  def simhash64(tokens: ArrayData): Long =
    HashExpressions.SimHash64.ofTokens(tokens)

  def wordShingles(tokens: ArrayData, k: Int): ArrayData =
    HashExpressions.WordShingles.ofTokens(tokens, k)

  def hyperplaneBucket(v: ArrayData, nPlanes: Int, seed: Int): Long =
    VectorExpressions.HyperplaneBucketExpr.bucket(v, nPlanes, seed)

  /** Morton interleave: result bit (i·n + j) = bit i of element j. Null
    * elements contribute zero bits (nulls cluster together). */
  def interleaveBits(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    var out = 0L
    var outBit = 0
    var i = 0
    while (i < bits && outBit < 63) {
      var j = 0
      while (j < n && outBit < 63) {
        val v = if (arr.isNullAt(j)) 0L else arr.getLong(j)
        out |= ((v >>> i) & 1L) << outBit
        outBit += 1
        j += 1
      }
      i += 1
    }
    out
  }
}
