package graft.cdc

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** The one justified custom typed aggregate (SURVEY.md §2.4.2): last-write-
  * wins by (tsMs, id) where a write may carry an EXPLICIT null — the
  * relational model of Mongo `$unset` (`TransactionViewUpsertService.kt:
  * 376-386,486`). The buffer distinguishes "no event ever wrote the field"
  * (absent → null) from "the latest write unset it" (explicit null), which
  * a plain `last(col, ignoreNulls=true)` cannot express.
  *
  * Used on the typed `Dataset[CdcEvent]` path; the untyped twin is the
  * `max(when(wrote, struct(ts, id, value)))` pattern in
  * [[graft.ops.Relational.lastNonNullPerKey]] / [[ViewReplay]] — `LastWriteAggSpec`
  * proves the two agree.
  *
  * Merge is associative/commutative (arg-max by (ts, id)), so Spark gets
  * map-side partial aggregation — the shape that scales.
  */
class LastWriteAgg(writes: CdcEvent => Boolean, value: CdcEvent => Option[String])
    extends Aggregator[CdcEvent, LastWriteAgg.Buf, Option[String]] {

  import LastWriteAgg.Buf

  override def zero: Buf = Buf(set = false, 0L, "", None)

  private def later(ts1: Long, id1: String, ts2: Long, id2: String): Boolean =
    ts1 > ts2 || (ts1 == ts2 && id1 > id2)

  override def reduce(b: Buf, e: CdcEvent): Buf =
    if (!writes(e)) b
    else if (!b.set || later(e.tsMs, e.id, b.ts, b.id)) Buf(set = true, e.tsMs, e.id, value(e))
    else b

  override def merge(a: Buf, b: Buf): Buf =
    if (!a.set) b
    else if (!b.set) a
    else if (later(b.ts, b.id, a.ts, a.id)) b
    else a

  override def finish(b: Buf): Option[String] = if (b.set) b.value else None

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Option[String]] = Encoders.product[Option[String]]
}

object LastWriteAgg {
  case class Buf(set: Boolean, ts: Long, id: String, value: Option[String])

  def column(name: String)(writes: CdcEvent => Boolean)(
      value: CdcEvent => Option[String]): TypedColumn[CdcEvent, Option[String]] =
    new LastWriteAgg(writes, value).toColumn.name(name)
}
