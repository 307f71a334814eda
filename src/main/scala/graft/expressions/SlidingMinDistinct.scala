package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct sliding-window minima of an `array<bigint>` in one O(n) pass —
  * the winnowing selection primitive (Schleimer et al.'s local fingerprint
  * pick, reference: q211's robust-winnowing screen).
  *
  * Semantics (exactly the SQL form it replaces):
  *   - n = 0        → empty array
  *   - 0 < n < w    → [global min]  (short docs keep their argmin)
  *   - n ≥ w        → distinct over { min(a[s..s+w−1]) : s = 0..n−w },
  *                    first-occurrence order
  *
  * Why an Expression: the HOF formulation
  * `array_distinct(transform(sequence(...), s -> array_min(slice(ka, s, w))))`
  * materializes a w-element slice per window start — O(n·w) copying and
  * interpreted `array_min` per window. The monotonic-deque walk here is
  * O(n) total with no allocation beyond the result, the standard
  * sliding-window-minimum algorithm. Interpreted eval only (the call sits
  * under an explode, not inside a hot codegen'd loop); results are exact
  * BIGINT so the DuckDB oracle is unchanged.
  */
case class SlidingMinDistinct(child: Expression, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(w >= 1, s"sliding-min window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sliding_min_distinct"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${dt.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < w) {
      var mn = a.getLong(0)
      var i = 1
      while (i < n) { val v = a.getLong(i); if (v < mn) mn = v; i += 1 }
      return new GenericArrayData(Array(mn))
    }
    // monotonic deque of indices: front is the current window's argmin
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(a.getLong(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SlidingMinDistinct =
    copy(child = newChild)
}
