package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Per-batch dimension refresh: enrichment picks up a mid-stream
  * dimension overwrite, and the reload is signature-gated (no re-read
  * when nothing changed). */
class DimRefreshSpec extends SparkSpec {

  import spark.implicits._

  test("mid-stream dim overwrite is visible to the next batch; reloads are gated") {
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dim").toString + "/dim"
    Seq((1L, "bronze"), (2L, "silver")).toDF("user_id", "segment")
      .coalesce(1).write.mode("overwrite").parquet(dimPath)

    implicit val ctx = spark.sqlContext
    val dim = new DimRefresh(spark, dimPath)
    val ms = MemoryStream[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    val q = ms.toDF().toDF("user_id", "event_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        DimRefresh.enriched(batch, dim.current(), "user_id")
          .select(col("user_id"), col("event_id"), coalesce(col("segment"), lit("?")))
          .collect().foreach(r => seen += ((r.getLong(0), r.getLong(1), r.getString(2))))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dim-ckpt").toString)
      .start()
    try {
      ms.addData(Seq((1L, 100L), (3L, 101L))); q.processAllAvailable()
      assert(seen.toSet == Set((1L, 100L, "bronze"), (3L, 101L, "?")))
      val reloadsAfterB1 = dim.reloads
      // unchanged dim: next batch must NOT re-read
      ms.addData(Seq((2L, 102L))); q.processAllAvailable()
      assert(seen.contains((2L, 102L, "silver")))
      assert(dim.reloads == reloadsAfterB1, "no change → no reload")
      // overwrite the dimension mid-stream: user 1 promoted, user 3 added
      Seq((1L, "gold"), (2L, "silver"), (3L, "bronze")).toDF("user_id", "segment")
        .coalesce(1).write.mode("overwrite").parquet(dimPath)
      ms.addData(Seq((1L, 103L), (3L, 104L))); q.processAllAvailable()
      assert(seen.contains((1L, 103L, "gold")), s"stale dim after overwrite: $seen")
      assert(seen.contains((3L, 104L, "bronze")))
      assert(dim.reloads == reloadsAfterB1 + 1, "exactly one reload for one change")
    } finally q.stop()
  }
}
