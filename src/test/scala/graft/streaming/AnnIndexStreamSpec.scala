package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.AnnIndex

/** Streaming IVF ingest: micro-batches append into the persisted index
  * against frozen centroids; replayed batches converge (idempotent
  * append); queries reach streamed vectors. */
class AnnIndexStreamSpec extends SparkSpec {

  import spark.implicits._

  private def unit(rnd: scala.util.Random): Seq[Float] = {
    val v = Array.fill(8)(rnd.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
    v.map(_ / n).toSeq
  }

  test("micro-batches land in frozen-centroid lists; replay is idempotent; queries see them") {
    val rnd = new scala.util.Random(23)
    val base = (0L until 64L).map(i => i -> unit(rnd))
    val stream1 = (100L until 120L).map(i => i -> unit(rnd))
    val stream2 = (200L until 220L).map(i => i -> unit(rnd))

    val path = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    AnnIndex.build(base.toDF("vec_id", "embedding"), path, nCentroids = 8)
    val centBefore = spark.read.parquet(s"$path/_centroids").collect().toSet

    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = AnnIndexStream.ingest(
      ms.toDF().toDF("vec_id", "embedding"), path,
      java.nio.file.Files.createTempDirectory("graft-annstream-ckpt").toString)
    try {
      ms.addData(stream1); q.processAllAvailable()
      ms.addData(stream2); q.processAllAvailable()
    } finally q.stop()

    val lists = spark.read.parquet(s"$path/lists")
    assert(lists.count() == 64L + 40L, "base + both micro-batches, no duplicates")
    assert(spark.read.parquet(s"$path/_centroids").collect().toSet == centBefore,
      "streaming ingest must never move the centroids")

    // at-least-once replay: re-delivering batch 1 must change nothing
    AnnIndex.append(stream1.toDF("vec_id", "embedding"), path, dedupe = true)
    assert(spark.read.parquet(s"$path/lists").count() == 104L,
      "idempotent append: replayed rows are dropped")

    // streamed vectors are query-reachable (query for themselves: a
    // vector's own bucket is its argmax centroid's list, which nProbe=8
    // certainly covers at 8 centroids)
    val res = AnnIndex.query(spark, path,
      stream2.take(5).toDF("vec_id", "embedding"), k = 3, nProbe = 8)
    assert(res.groupBy("query_id").count().count() == 5,
      "every streamed query vector must find neighbors")
  }
}
