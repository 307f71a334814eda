package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec

/** O2 operational parity — catch-up then incremental resume: the reference
  * restarts from its saved resume token and replays the backlog before
  * going continuous (`EcommerceTransactionsLogEventsStream.kt:71-91`). The
  * Spark-native form is `Trigger.AvailableNow`: drain everything the
  * source currently has in BOUNDED micro-batches (respecting
  * `maxFilesPerTrigger`, unlike the one-giant-batch `Trigger.Once`), then
  * terminate; a later run with the same checkpoint processes ONLY what
  * arrived since — the nightly-catch-up / backfill-then-continuous
  * pattern, with the offset bookkeeping entirely in the checkpoint. */
class AvailableNowSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("AvailableNow drains the backlog in bounded batches and terminates; " +
    "a restart on the same checkpoint ingests only the new files") {
    val in = Files.createTempDirectory("graft-an-in").toString
    val ck = Files.createTempDirectory("graft-an-ck").toString

    def addFile(ids: Long*): Unit =
      ids.map(i => (i, s"doc $i")).toDF("id", "text")
        .coalesce(1).write.mode("append").parquet(in)

    val seen = new ConcurrentLinkedQueue[Long]()
    val batches = new AtomicInteger(0)

    def drain(): Boolean = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // bounded catch-up batches
        .parquet(in)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("id").as[Long](implicitly).collect()
          if (ids.nonEmpty) { batches.incrementAndGet(); ids.foreach(seen.add) }
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    addFile(1L); addFile(2L); addFile(3L)
    assert(drain(), "catch-up run must terminate on its own")
    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // maxFilesPerTrigger=1 → the 3-file backlog must NOT collapse into one batch
    assert(batches.get() >= 3, s"expected >=3 bounded batches, got ${batches.get()}")

    // new arrivals; same checkpoint → only these are processed
    seen.clear(); batches.set(0)
    addFile(4L); addFile(5L)
    assert(drain(), "incremental run must terminate on its own")
    assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      == Seq(4L, 5L), "restart must resume from the checkpointed offset")

    // nothing new → a third run emits nothing (no reprocessing)
    seen.clear()
    assert(drain(), "no-op run must terminate on its own")
    assert(seen.isEmpty, "replaying a drained source must emit no rows")
  }
}
