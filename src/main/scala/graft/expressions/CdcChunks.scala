package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a token array in one pass — the q144
  * per-document subtree (cut decision per token, chunk grouping, chunk
  * hash) fused into one expression returning
  * `array<struct<chunk_id, chunk_hash, chunk_len>>`.
  *
  * Semantics (exactly the composed form it replaces): the stream cuts
  * AFTER every token whose md5 first byte ≡ 0 (mod `cutMod`) — i.e.
  * `conv(substring(md5(token), 1, 2), 16, 10) % cutMod = 0`; chunk_id
  * is the running count of PRIOR cuts (the exclusive prefix sum of the
  * cut flags); chunk_hash = md5 hex of the chunk's tokens joined by a
  * single space; chunk_len = tokens in the chunk. Empty array in →
  * empty array out (a tokenless doc emits no chunks).
  *
  * Why an Expression: the declarative form pays a posexplode of every
  * token, a per-doc WindowExec (running sum of cuts) and a
  * groupBy(doc, chunk) with a sorted struct collect — three row
  * explosions of the corpus for values that are a linear in-row walk.
  * Null tokens md5 as absent (`concat_ws` skips them in the chunk
  * text; the cut test treats null as no-cut), matching the composed
  * form where md5(NULL) is NULL and NULL % m is never 0.
  */
case class CdcChunks(child: Expression, cutMod: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(cutMod >= 1, s"cut modulus must be >= 1, got $cutMod")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_id", LongType, nullable = false),
      StructField("chunk_hash", StringType, nullable = false),
      StructField("chunk_len", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    import CdcChunks.{hex32, md, Space}
    val t = input.asInstanceOf[ArrayData]
    val n = t.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val digest = md.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // chunkDigest accumulates the joined-by-space chunk text incrementally
    val chunkDigest = java.security.MessageDigest.getInstance("MD5")
    var chunkId = 0L
    var chunkLen = 0L
    var i = 0
    while (i < n) {
      val isNull = t.isNullAt(i)
      val tok = if (isNull) null else t.getUTF8String(i).getBytes
      if (!isNull) {
        if (chunkLen > 0) chunkDigest.update(Space, 0, 1)
        chunkDigest.update(tok)
      }
      // concat_ws skips nulls in the chunk TEXT, but the composed form's
      // count(1) counts the row — keep the row in chunk_len
      chunkLen += 1
      val cut = if (isNull) false else {
        digest.reset()
        digest.update(tok)
        val d0 = digest.digest()(0) & 0xFF
        d0 % cutMod == 0
      }
      if (cut || i == n - 1) {
        out += InternalRow(chunkId,
          hex32(chunkDigest.digest()), // digest() also resets
          chunkLen)
        chunkId += 1L
        chunkLen = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private[expressions] val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[expressions] val Space =
    " ".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val Hex = "0123456789abcdef".toCharArray
  private[expressions] def hex32(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = Hex(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
