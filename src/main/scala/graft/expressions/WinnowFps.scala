package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused winnowing fingerprints of a token array — the whole q211
  * per-document subtree (token n-grams → md5-prefix hash → packed
  * position key → sliding-window minima → distinct decoded hashes) in
  * ONE pass over the tokens.
  *
  * Replaces the three-expression form
  * `transform(sequence(...), i -> conv(substring(md5(concat_ws(' ',
  * gram)), 1, 8), 16, 10) * 2²¹ + least(i−1, 2²¹−1))` piped through
  * [[SlidingMinDistinct]] and `array_distinct(transform(_, k -> k div
  * 2²¹))`: the HOF lambda there is interpreted per gram and its md5
  * allocates a hex string that `substring`+`conv` immediately re-parse.
  * Here the digest is incremental over the gram's token bytes (no gram
  * string is ever materialized), the hash is the first 4 digest bytes
  * as an unsigned 32-bit value (== `conv(substring(hex, 1, 8), 16,
  * 10)`), and the monotonic-deque walk runs inline — bit-identical
  * fingerprint sets (spec-pinned A/B), measured ~2× on the q211 pass.
  *
  * Semantics (exactly the composed form):
  *   - fewer than n tokens → empty array
  *   - m = #grams < w     → [hash of the global packed-key argmin]
  *   - m ≥ w              → distinct decoded hashes of the per-window
  *                          packed-key minima, first-occurrence order
  * Null tokens are skipped inside a gram the way `concat_ws` skips
  * them. Position packs as `min(i, 2²¹−1)` — ties within a window
  * resolve to the leftmost gram; equal-hash picks decode identically.
  */
case class WinnowFps(child: Expression, n: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, s"gram size must be >= 1, got $n")
  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import WinnowFps.{PosCap, Space}
    val t = input.asInstanceOf[ArrayData]
    val nTok = t.numElements()
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val digest = WinnowFps.md.get()
    // token bytes materialized once per token, reused across the n
    // grams each token participates in
    val tb = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) {
      tb(i) = if (t.isNullAt(i)) null else t.getUTF8String(i).getBytes
      i += 1
    }
    val ka = new Array[Long](m)
    i = 0
    while (i < m) {
      digest.reset()
      var j = 0
      var first = true
      while (j < n) {
        val b = tb(i + j)
        if (b != null) { // concat_ws semantics: nulls are skipped
          if (!first) digest.update(Space, 0, 1)
          digest.update(b)
          first = false
        }
        j += 1
      }
      val d = digest.digest()
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      ka(i) = h * 2097152L + math.min(i.toLong, PosCap.toLong)
      i += 1
    }
    if (m < w) {
      var mn = ka(0)
      i = 1
      while (i < m) { if (ka(i) < mn) mn = ka(i); i += 1 }
      return new GenericArrayData(Array(mn / 2097152L))
    }
    // monotonic deque over packed keys; decode + dedup as we select
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      val v = ka(i)
      while (tail > head && ka(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(ka(deque(head)) / 2097152L)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  // executor-static (a ThreadLocal field on the case class would ride
  // along in task serialization — ThreadLocal isn't Serializable)
  private[expressions] val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[expressions] val Space =
    " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private[expressions] val PosCap = (1 << 21) - 1 // 2097151
}
