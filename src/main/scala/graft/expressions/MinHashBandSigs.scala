package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: banded MinHash signatures of a hashed
  * token set, in one compiled pass.
  *
  * For a doc's token-hash array it computes `rows × bands` min-wise
  * hashes (seed s: min over the array of XXH64(h, s)) and folds each
  * consecutive group of `rows` minima into ONE 64-bit band signature
  * via an XXH64 chain. Output: `bands` longs — element b is the AND-
  * amplified signature of band b, joinable directly on (band, sig).
  *
  * Replaces the interpreted pipeline `array_min(transform(th,
  * h -> xxhash64(seed, h)))` × k followed by a `concat_ws` string
  * signature and a `bands`-way unionAll: Spark HOFs are interpreted
  * (no codegen) and the union re-evaluated the k transforms once per
  * band branch, so the per-doc cost was k × bands interpreted array
  * passes plus string building. This kernel is a single compiled
  * scan of the array maintaining k running minima (k·|th| hashLong
  * calls total), and the long signature shuffles/compares cheaper
  * than the 40-char concat string it replaces.
  */
case class MinHashBandSigs(child: Expression, rows: Int, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(LongType, containsNull = false) ||
      child.dataType == ArrayType(LongType, containsNull = true))
      if (rows >= 1 && bands >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_bandsigs requires positive (rows, bands), got ($rows, $bands)")
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bandsigs requires array<bigint>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_bandsigs"

  override def nullSafeEval(input: Any): Any =
    MinHashBandSigs.compute(input.asInstanceOf[ArrayData], rows, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MinHashBandSigs.compute($c, $rows, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandSigs {

  private val Seed = 42L

  /** Static kernel shared by eval and generated code. */
  def compute(th: ArrayData, rows: Int, bands: Int): ArrayData = {
    val k = rows * bands
    val n = th.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      var s = 0
      while (s < k) {
        val v = XXH64.hashLong(h, s.toLong)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    val sigs = new Array[Long](bands)
    var bd = 0
    while (bd < bands) {
      var sig = Seed
      var r = 0
      while (r < rows) { sig = XXH64.hashLong(mins(bd * rows + r), sig); r += 1 }
      sigs(bd) = sig
      bd += 1
    }
    new GenericArrayData(sigs)
  }
}
