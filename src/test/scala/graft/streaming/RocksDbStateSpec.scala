package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.cdc.{CdcEvent, EventGen, ReferenceFold, TransactionView}

/** The stateful merge ladder under the RocksDB state-store provider (with
  * changelog checkpointing) must produce exactly the canonical fold — the
  * provider swap is a pure storage substitution, but RocksDB round-trips
  * state through its own encoders, so a spec guards the compatibility the
  * bench's throughput leg assumes. */
class RocksDbStateSpec extends SparkSpec {

  import spark.implicits._

  test("flatMapGroupsWithState merge under RocksDB equals the canonical fold") {
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    try {
      val events = EventGen.generate(nTx = 25, seed = 77L)
      val ms = MemoryStream[CdcEvent]
      val got = scala.collection.concurrent.TrieMap.empty[String, TransactionView]
      val q = CdcStream.viewUpdates(ms.toDS())
        .writeStream.outputMode("update")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[TransactionView], _: Long) =>
          ds.collect().foreach(v => got(v.transactionId) = v)
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-rocks-ckpt").toString)
        .start()
      try {
        events.grouped(math.max(events.size / 5, 1)).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
      } finally q.stop()
      val want = ReferenceFold.replay(
        events.filter(_.ttl.isEmpty).distinctBy(_.id).sortBy(e => (e.tsMs, e.id)))
      assert(got.toMap == want)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }
}
