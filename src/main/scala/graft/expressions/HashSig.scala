package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document hash signatures — the codegen'd scalar form of the
  * dedup family's hottest subtree.
  *
  * The declarative formulation (explode shingles → `numHashes` md5 columns
  * → groupBy(id) min) is semantically right but pays for it three times at
  * scale: the exploded table is |docs|·|shingles| rows, every row carries
  * `numHashes` separate `Md5` expressions (each allocating a fresh
  * MessageDigest and hex-encoding to a 32-char string), and the signature
  * needs a full shuffle on id to reassemble. These expressions compute the
  * SAME signature per document row in one pass — a thread-local
  * MessageDigest reused across shingles×hashes, byte-array min instead of
  * hex-string min (unsigned byte order == lexicographic hex order, so the
  * result is bit-identical), no explode, NO SHUFFLE. The dedup pipeline's
  * only remaining shuffle is the one that's semantically necessary: the
  * band-key / segment-key candidate join.
  *
  * Oracle parity: `graft_minhash_sig(shingles, k)[i]` ==
  * `min(md5(i || ':' || shingle))` over the document's shingles, and
  * `graft_simhash64(tokens)` == the nibble-majority SimHash of
  * [[graft.ops.Dedup.simhash64]]'s original aggregate — both still pure
  * md5 constructions the DuckDB oracle expresses exactly.
  */
object HashSigUtil {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Hex = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = Hex(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** a < b over equal-length byte arrays, UNSIGNED lexicographic — the
    * byte-level equivalent of comparing lowercase-hex strings. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xFF; val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** MinHash signature of a shingle array: element i = min over shingles of
    * md5(i ":" shingle), as 32-char lowercase hex. Null on empty input
    * (parity with the explode formulation, which emits no row). Called
    * from generated code — keep the signature Java-simple. */
  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val digest = md.get()
    val prefixes = Array.tabulate(numHashes)(i =>
      (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](numHashes)
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        val tok = arr.getUTF8String(s).getBytes
        var i = 0
        while (i < numHashes) {
          digest.reset()
          digest.update(prefixes(i))
          digest.update(tok)
          val d = digest.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      s += 1
    }
    if (numHashes > 0 && mins(0) == null) return null // no non-null shingle
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = hex32(mins(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of a token array: token bit j = bit (j mod 4) of hex
    * nibble (j div 4) of md5(token); document bit j = majority (ties → 1).
    * Returns the raw two's-complement BIGINT (bit 63 = sign). -1 is used
    * as "null" sentinel NEVER — the caller checks numElements first. */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val digest = md.get()
    val counts = new Array[Int](64)
    var s = 0
    while (s < n) {
      if (!arr.isNullAt(s)) {
        digest.reset()
        digest.update(arr.getUTF8String(s).getBytes)
        val d = digest.digest()
        var j = 0
        while (j < 64) {
          val p = j >> 2 // hex-char index 0..15
          val b = d(p >> 1)
          val nibble = if ((p & 1) == 0) (b >> 4) & 0xF else b & 0xF
          if (((nibble >> (j & 3)) & 1) == 1) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      s += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) >= 0) sig += (if (j == 63) Long.MinValue else 1L << j)
      j += 1
    }
    sig
  }

  /** True iff the array has at least one non-null element (codegen guard —
    * all-null/empty inputs must yield SQL NULL, matching explode-drop). */
  def hasNonNull(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) return true; i += 1 }
    false
  }
}

/** `graft_minhash_sig(array<string>, k)` → `array<string>` of k 32-char
  * hex min-hashes; NULL on empty/all-null input. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive literal k), got " +
        s"${child.dataType.simpleString} with k=$numHashes")
  }

  override def nullSafeEval(in: Any): Any =
    HashSigUtil.minhashSig(in.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.HashSigUtil.minhashSig($c, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_simhash64(array<string>)` → BIGINT SimHash; NULL on empty/all-null
  * input. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    if (!HashSigUtil.hasNonNull(arr)) null else HashSigUtil.simhash64(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if (!graft.expressions.HashSigUtil.hasNonNull($c)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.HashSigUtil.simhash64($c);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
