package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the SORTED DISTINCT n-token shingle hash
  * set of a space-separated text, in one compiled pass.
  *
  * Replaces the equivalent higher-order-function pipeline
  * `sort_array(array_distinct(transform(sequence(...), i ->
  * xxhash64(tok_i, tok_i+1, tok_i+2))))` — Spark HOFs are interpreted
  * (no codegen), and constraint inference re-inlines such a chain into
  * pushed-down IsNotNull scan filters on every join input, so the
  * interpreted cost is paid several times per document. This kernel
  * runs the whole thing as straight-line JVM code over the UTF8 bytes:
  * tokens are split on 0x20 (keeping empties — same as `split(text,
  * ' ')`), each token is XXH64-hashed zero-copy, shingles chain the n
  * token hashes through XXH64's long finalizer, and the result is
  * dedup-sorted in place. Hash identity with any string form is NOT
  * required by callers — only set cardinalities are consumed (jaccard)
  * — but 64-bit width keeps cross-doc phantom intersections below
  * ~1e-7 per pair at this corpus size.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires (string, positive int literal), got " +
        s"${child.dataType.catalogString}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  private val Seed = 42L

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val len = text.numBytes()
    // token hashes: split on 0x20, keeping empty tokens (split semantics)
    var nTokens = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == ' '.toByte) nTokens += 1
      i += 1
    }
    val th = new Array[Long](nTokens)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || text.getByte(i) == ' '.toByte) {
        th(t) = XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
        t += 1
        start = i + 1
      }
      i += 1
    }
    val nSh = nTokens - n + 1
    if (nSh <= 0) return new GenericArrayData(Array.emptyLongArray)
    val sh = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      sh(i) = h
      i += 1
    }
    java.util.Arrays.sort(sh)
    // in-place dedup of the sorted array
    var w = 1
    i = 1
    while (i < nSh) {
      if (sh(i) != sh(w - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, w))
  }
}
