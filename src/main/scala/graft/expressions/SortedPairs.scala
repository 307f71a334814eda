package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (a[i], a[j]) with i < j of a sorted `array<bigint>`
  * as one `array<struct<id_a, id_b>>` — the in-row pair generator of the
  * df-capped inverted index ([[graft.ops.Dedup.cappedPostingPairs]]).
  *
  * Replaces the HOF form `flatten(transform(sids, (x, i) ->
  * transform(slice(sids, i + 2, size(sids)), y -> struct(x, y))))`:
  * `slice` copies a suffix array per element (O(L²) allocation before
  * any pair is emitted) and the nested lambdas evaluate interpreted per
  * pair. Here the L·(L−1)/2 structs are written in one preallocated
  * walk. Output order (lexicographic by (i, j)) and values are
  * identical; id_a < id_b holds because the input is sorted-distinct.
  */
case class SortedPairs(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    // pair count in Long: at n ≈ 65536+ the Int product overflows to a
    // negative allocation size. The board's inputs are df-capped far below
    // that, but the function is registered as a general SQL UDF — fail
    // loudly past the bound instead of NegativeArraySizeException (and the
    // emitted array must itself stay addressable).
    val nPairs = n.toLong * (n - 1L) / 2L
    if (nPairs > Int.MaxValue - 8) throw new IllegalArgumentException(
      s"$prettyName: $n elements produce $nPairs pairs, beyond the max array size; " +
        "cap the input list (see CappedCollectLongs) before pairing")
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      // the type check accepts containsNull arrays (aggregate outputs often
      // carry the permissive type); getLong on a null slot silently yields 0
      // and corrupts pair identities — fail fast instead (one branch per
      // ELEMENT, not per pair)
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at index $i; input must be a sorted non-null id list")
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(x, a.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}
