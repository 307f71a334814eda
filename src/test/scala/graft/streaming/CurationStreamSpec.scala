package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Continuous curation ledger: quality gate upstream of the duplicate
  * screen, per-doc decisions durably upserted into a ViewStore. */
class CurationStreamSpec extends SparkSpec {

  import spark.implicits._

  private val good1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val good2 = "one two three four five six seven eight nine ten"
  private val good3 = "red orange yellow green blue indigo violet pink brown black"
  private val short_ = "too few tokens here"

  private def runBatches(batches: Seq[Seq[(Long, Long, String)]]): String = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    val ledger = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ledger-ckpt").toString
    val q = CurationStream.run(
      ms.toDF().toDF("doc_id", "ts_ms", "text"), ledger, ckpt)
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    ledger
  }

  test("quality-dropped docs never reach the ledger; dups are flagged cross-batch") {
    val ledger = runBatches(Seq(
      Seq((1L, 1000L, good1), (2L, 1500L, short_), (3L, 2000L, good2)),
      Seq((4L, 3000L, good1), // exact dup of doc 1, later batch
          (5L, 4000L, good3))))
    val rows = ViewStore.read(spark, ledger).get
      .select("doc_id", "is_near_dup").as[(Long, Int)].collect().toMap
    assert(!rows.contains(2L), "quality-dropped doc must not be curated at all")
    assert(rows == Map(1L -> 0, 3L -> 0, 4L -> 1, 5L -> 0), s"got $rows")
  }

  test("ledger survives across batches and buckets rewrite incrementally") {
    val ledger = runBatches(Seq(
      Seq((10L, 1000L, good1)),
      Seq((11L, 2000L, good2)),
      Seq((12L, 3000L, good3))))
    val m = ViewStore.readManifest(spark, ledger).get
    assert(m.lastBatchId >= 2L, s"three batches must have committed, got $m")
    assert(ViewStore.read(spark, ledger).get.count() == 3L)
    // decisions are per-doc rows with the bucket column stripped on read
    val cols = ViewStore.read(spark, ledger).get.columns.toSet
    assert(cols == Set("doc_id", "ts_ms", "is_near_dup"), s"got $cols")
  }

  test("a later batch hitting an already-populated bucket merges, not crashes") {
    // pick two distinct doc ids that hash to the SAME ViewStore bucket, so
    // batch 2's readBuckets returns batch 1's rows (which come back WITHOUT
    // the __bucket partition column — the union must tolerate that)
    val byBucket = spark.range(1, 500)
      .select(col("id"), ViewStore.bucketOf(col("id")).as("b"))
      .as[(Long, Long)].collect().groupBy(_._2).values.find(_.length >= 2).get
    val (idA, idB) = (byBucket(0)._1, byBucket(1)._1)
    val ledger = runBatches(Seq(
      Seq((idA, 1000L, good1)),
      Seq((idB, 2000L, good2)))) // same bucket, different text
    val rows = ViewStore.read(spark, ledger).get
      .select("doc_id", "is_near_dup").as[(Long, Int)].collect().toMap
    assert(rows == Map(idA -> 0, idB -> 0), s"got $rows")
  }

  test("qualityKeep agrees with the batch q26 keep flag on the test corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val stream = docs.select(col("doc_id"),
      CurationStream.qualityKeep(col("text")).cast("int").as("keep_s"))
    val batch = graft.queries.DataPrepQueries
      .q26_quality_filter(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("keep").as("keep_b"))
    val disagree = stream.join(batch, "doc_id")
      .filter(col("keep_s") =!= col("keep_b")).count()
    assert(disagree == 0L)
  }
}
