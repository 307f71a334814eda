package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character n-gram COUNTS `array<struct<g, c>>` — the
  * pre-aggregated sibling of [[CharGrams]] for profile builders that
  * explode grams only to count them (q372's source×trigram profile):
  * a document's within-row repetition collapses before the explode, so
  * the generator emits one row per DISTINCT gram per document instead of
  * one per occurrence, and the downstream partial aggregate hashes
  * proportionally fewer rows (`sum(c)` replaces `count(*)`; the final
  * (source, gram) counts are identical by associativity).
  *
  * Grams are CHARACTER-indexed (UTF8String code-point semantics, exactly
  * SQL `substring`), emitted in first-occurrence order (deterministic);
  * a string shorter than n yields an empty array.
  */
case class CharGramCounts(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_gram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val m = s.numChars()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    // first-occurrence order; values boxed once per DISTINCT gram (the
    // per-row domain is bounded by the document length). The capacity is
    // only a sizing hint — clamp it so a >=2^30-char string can't
    // overflow Int into a negative capacity (ADVICE r10).
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](
      math.min(cnt.toLong * 2, 1L << 26).toInt)
    var i = 0
    while (i < cnt) {
      val g = s.substringSQL(i + 1, n)
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramCounts =
    copy(child = newChild)
}
