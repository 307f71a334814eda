package graft.streaming

import graft.SparkSpec
import graft.ops.KMeans
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X255 — continuous mini-batch k-means: a single-batch stream equals
  * the batch Lloyd seed + one assignment fold; replays are guarded;
  * state stays k·dims rows however much data streams; identical runs
  * are bit-deterministic. */
class KMeansStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def vecs(seed: Int, n: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val center = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.fill(4)(center + rnd.nextFloat() * 0.1f))
    }
  }

  test("single batch == Lloyd seed + one deterministic assignment fold") {
    val state = Files.createTempDirectory("graft-kms-state").toString
    val ckpt = Files.createTempDirectory("graft-kms-ckpt").toString
    val data = vecs(seed = 3, n = 40)
    val ms = MemoryStream[(Long, Array[Float])]
    val q = KMeansStream.maintain(
      ms.toDS().toDF("vec_id", "embedding"), state, ckpt, k = 2)
    try { ms.addData(data); q.processAllAvailable() } finally q.stop()
    val got = KMeansStream.centroids(spark, state)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    // expected: seed centroids from the SAME batch, one assignment,
    // floor-mean per dimension — replicated with the batch machinery
    val batch = data.toDF("vec_id", "embedding")
    val cents = KMeans.lloydCentroids(batch, k = 2, rounds = 1)
    val want = KMeansStream.assignDelta(batch, cents)
      // the BATCH update rule verbatim (floor toward -inf), not the
      // served-path formula — so a truncating-division regression in
      // centroids() shows up here instead of being mirrored
      .withColumn("cv", floor(col("s").cast("double") / col("n")).cast("long"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
      .select(col("cluster"), expr("transform(pc, x -> x.cv)").as("cvq"))
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    assert(got == want, s"$got != $want")
    // bounded state: k clusters x 4 dims accumulator rows
    assert(KMeansStream.accSnapshot(spark, state).count() <= 2L * 4L)
  }

  test("multi-batch fold is deterministic, replay-guarded, state stays bounded") {
    def run(): Seq[(Long, Seq[Long])] = {
      val state = Files.createTempDirectory("graft-kms-det").toString
      val ckpt = Files.createTempDirectory("graft-kms-det-ck").toString
      val ms = MemoryStream[(Long, Array[Float])]
      val q = KMeansStream.maintain(
        ms.toDS().toDF("vec_id", "embedding"), state, ckpt, k = 2)
      try {
        vecs(seed = 9, n = 60).grouped(20).foreach { g =>
          ms.addData(g); q.processAllAvailable()
        }
      } finally q.stop()
      val out = KMeansStream.centroids(spark, state)
        .orderBy("cluster").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
      assert(KMeansStream.accSnapshot(spark, state).count() <= 2L * 4L,
        "state must stay k x dims however many batches stream")
      // replay on the same checkpoint folds nothing new
      val before = KMeansStream.accSnapshot(spark, state).agg(sum("n")).as[Long].head()
      val ms2 = MemoryStream[(Long, Array[Float])]
      val q2 = KMeansStream.maintain(
        ms2.toDS().toDF("vec_id", "embedding"), state, ckpt, k = 2)
      try q2.processAllAvailable() finally q2.stop()
      val after = KMeansStream.accSnapshot(spark, state).agg(sum("n")).as[Long].head()
      assert(before == after, "replay must not double-fold")
      out
    }
    assert(run() == run(), "identical stream + split must be bit-deterministic")
  }

  test("negative per-dim sums floor toward -inf (batch rule), not toward zero") {
    // all-negative vectors make every accumulator sum negative with a
    // non-exact mean — `s div n` (truncate) would serve -1 where the
    // batch rule floor(-5/4) = -2 (round-6 ADVICE divergence)
    val state = Files.createTempDirectory("graft-kms-neg").toString
    val ckpt = Files.createTempDirectory("graft-kms-neg-ck").toString
    val data = (0L until 4L).map(i =>
      (i, Array.fill(2)(-0.00125f * (i + 1))))  // quantized: -1,-2,-3,-4 → s=-10,n=4
    val ms = MemoryStream[(Long, Array[Float])]
    val q = KMeansStream.maintain(
      ms.toDS().toDF("vec_id", "embedding"), state, ckpt, k = 1)
    try { ms.addData(data); q.processAllAvailable() } finally q.stop()
    val acc = KMeansStream.accSnapshot(spark, state)
      .select("pos", "s", "n").as[(Int, Long, Long)].collect()
      .map { case (pos, s, n) => pos -> ((s, n)) }.toMap
    val served = KMeansStream.centroids(spark, state)
      .select("cvq").as[Seq[Long]].head()
    acc.foreach { case (pos, (s, n)) =>
      assert(s < 0, s"test premise: pos=$pos sum must be negative (got $s)")
      assert(served(pos) == math.floor(s.toDouble / n).toLong,
        s"pos=$pos: served ${served(pos)} != floor($s/$n)")
    }
    assert(acc.exists { case (_, (s, n)) => s % n != 0 },
      "test premise: at least one dim must have a non-exact mean, " +
        "else floor and truncate agree and the test is vacuous")
  }
}
