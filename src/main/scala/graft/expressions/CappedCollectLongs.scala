package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Df-capped posting-list collector: `graft_capped_collect(id, cap)` →
  * the group's ids SORTED ascending if the group has between 2 and `cap`
  * members, else an EMPTY array (singleton groups pair with nothing; a
  * group past `cap` is a hot key the posting-pair discipline drops).
  *
  * This fuses [[graft.ops.Dedup.cappedPostingPairs]]'s two-pass cap
  * (df count + semi join, then collect_list — TWO shuffles of the keyed
  * table) into ONE aggregation while keeping the bound the two-pass form
  * existed for: the buffer never holds more than `cap`+1 ids — the
  * (cap+1)-th arrival proves the key is hot, everything after is
  * discarded unexamined, so a million-document posting list costs the
  * same bounded memory as a cap-sized one. Partial aggregation
  * (ObjectHashAggregate) applies map-side; merge saturates the same way.
  */
case class CappedCollectLongs(
    idExpr: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedCollectLongs.Buf] {

  private lazy val cap: Int = capExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"cap must be a literal int, got $other")
  }

  override def children: Seq[Expression] = Seq(idExpr, capExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_capped_collect"

  override def createAggregationBuffer(): CappedCollectLongs.Buf =
    new CappedCollectLongs.Buf(new Array[Long](math.min(cap + 1, 16)), 0)

  private def add(buf: CappedCollectLongs.Buf, v: Long): Unit = {
    if (buf.n > cap) return // saturated: key already proven hot
    if (buf.n == buf.a.length) {
      val grown = new Array[Long](math.min(math.max(buf.a.length * 2, 16), cap + 1))
      System.arraycopy(buf.a, 0, grown, 0, buf.n)
      buf.a = grown
    }
    buf.a(buf.n) = v
    buf.n += 1
  }

  override def update(buf: CappedCollectLongs.Buf, input: InternalRow): CappedCollectLongs.Buf = {
    val v = idExpr.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CappedCollectLongs.Buf, other: CappedCollectLongs.Buf): CappedCollectLongs.Buf = {
    // a saturated side proves the key hot — its backing array may be
    // empty (deserialize ships the sentinel alone), so don't read it
    if (other.n > cap) { buf.n = cap + 1; return buf }
    var i = 0
    while (i < other.n && buf.n <= cap) { add(buf, other.a(i)); i += 1 }
    buf
  }

  override def eval(buf: CappedCollectLongs.Buf): Any = {
    if (buf.n > cap || buf.n < 2) return new GenericArrayData(Array.empty[Long])
    val out = java.util.Arrays.copyOf(buf.a, buf.n)
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: CappedCollectLongs.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // n > cap is the saturation sentinel (merge may set it without the
    // backing array holding cap+1 entries) — a hot key's content is
    // irrelevant downstream, so ship the sentinel alone
    out.writeInt(buf.n)
    if (buf.n <= cap) {
      var i = 0
      while (i < buf.n) { out.writeLong(buf.a(i)); i += 1 }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedCollectLongs.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n > cap) return new CappedCollectLongs.Buf(new Array[Long](0), n)
    val a = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { a(i) = in.readLong(); i += 1 }
    new CappedCollectLongs.Buf(a, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedCollectLongs =
    copy(idExpr = newChildren(0), capExpr = newChildren(1))
}

object CappedCollectLongs {
  /** Mutable growable long buffer; `n` may exceed the array length by the
    * saturation sentinel convention (n == cap+1 with a ≤ cap+1 backing). */
  final class Buf(var a: Array[Long], var n: Int)
}
