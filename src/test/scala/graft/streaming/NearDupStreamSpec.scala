package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Dedup

/** Streaming LSH near-dup screen: a doc is flagged iff every band key was
  * already claimed — across micro-batches (state) and within one batch
  * (arrival-order tie-break). Must agree with the batch band screen. */
class NearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, String)]]): Map[Long, Boolean] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val results = scala.collection.concurrent.TrieMap.empty[Long, Boolean]
    val q = NearDupStream.bandVerdicts(
      ms.toDF().toDF("doc_id", "ts_ms", "text"))
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[NearDupStream.BandVerdict], _: Long) =>
        NearDupStream.nearDupFlags(ds.toDF()).collect()
          .foreach(r => results(r.getLong(0)) = r.getBoolean(1))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-neardup-ckpt").toString)
      .start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      results.toMap
    } finally q.stop()
  }

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("cross-batch: an identical later doc is flagged, novel docs are not") {
    val flags = run(Seq(
      Seq((1L, 1000L, base), (2L, 2000L, "one two three four five six seven eight nine ten")),
      Seq((3L, 3000L, base), // exact dup of doc 1, later batch
          (4L, 4000L, "red orange yellow green blue indigo violet pink brown black"))))
    assert(flags(1L) == false)
    assert(flags(2L) == false)
    assert(flags(3L) == true, "identical doc in a later batch must be flagged")
    assert(flags(4L) == false)
  }

  test("within one batch the (ts, doc_id)-earlier doc claims; the later one is flagged") {
    val flags = run(Seq(Seq((10L, 1000L, base), (11L, 2000L, base))))
    assert(flags(10L) == false)
    assert(flags(11L) == true)
  }

  test("stream verdicts agree with the batch band screen on the same corpus") {
    val docs = Seq(
      (1L, 1000L, base),
      (2L, 2000L, "one two three four five six seven eight nine ten"),
      (3L, 3000L, base),
      (4L, 4000L, base + " extra trailing tokens here"), // near-dup: shares most shingles
      (5L, 5000L, "completely different words entirely unrelated content runs through here now"))
    val flags = run(docs.grouped(2).toSeq)
    // batch screen: doc flagged iff ALL its band keys appear for some
    // (ts, id)-earlier doc
    val banded = Dedup.minhashBands(docs.toDF("doc_id", "ts_ms", "text"))
      .join(docs.toDF("id", "ts_ms", "text").select("id", "ts_ms"), "id")
    val first = banded.groupBy("band", "band_key")
      .agg(min(struct(col("ts_ms"), col("id"))).as("f"))
      .select(col("band"), col("band_key"), col("f.id").as("first_id"))
    val expected = banded.join(first, Seq("band", "band_key"))
      .groupBy("id")
      .agg((count(lit(1)) === sum(when(col("first_id") =!= col("id"), 1L).otherwise(0L)))
        .as("dup"))
      .as[(Long, Boolean)].collect().toMap
    assert(flags == expected, s"stream=$flags batch=$expected")
  }
}
