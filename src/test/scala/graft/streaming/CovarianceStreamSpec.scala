package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streamed moment table must equal the batch sums exactly after any
  * batch split (plain integer sums — Spark's own update-mode aggregation
  * carries the cross-batch state), and the PC1 derived from the moments
  * must replay q300's arithmetic bit-for-bit. */
class CovarianceStreamSpec extends SparkSpec {

  import spark.implicits._

  private val vecs: Seq[(Long, Seq[Float])] = (0 until 40).map { i =>
    (i.toLong, Seq.tabulate(6)(d =>
      (math.sin(i * (d + 1) * 0.7) + 0.02 * d * i).toFloat))
  }

  private def runMoments(batches: Seq[Seq[(Long, Seq[Float])]]): Map[(Long, Long), Long] = {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val latest = scala.collection.mutable.Map.empty[(Long, Long), Long]
    val q = CovarianceStream.moments(
      ms.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        latest.synchronized {
          df.collect().foreach(r =>
            latest((r.getLong(0), r.getLong(1))) = r.getLong(2))
        }
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cov-ckpt").toString)
      .start()
    try { batches.foreach { b => ms.addData(b); q.processAllAvailable() } }
    finally q.stop()
    latest.toMap
  }

  private def batchMoments(all: Seq[(Long, Seq[Float])]): Map[(Long, Long), Long] = {
    val df = all.toDF("vec_id", "embedding")
    val q = graft.functions.VectorFunctions.quantize(col("embedding"))
    df.select(concat(array(lit(1L)), q).as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i").cast("long").as("i"), col("xi"),
        posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j").cast("long").as("j"))
      .agg(sum(col("xi") * col("xj")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("streamed moments over split batches == batch sums exactly") {
    val got = runMoments(vecs.grouped(17).toSeq)
    val want = batchMoments(vecs)
    assert(got == want, "update-mode sums must converge to the batch sums")
    assert(want((0L, 0L)) == vecs.size.toLong, "S00 carries n")
  }

  test("PC1 from moments replays the direct power iteration bit-for-bit") {
    val momentsDf = batchMoments(vecs).toSeq
      .map { case ((i, j), s) => (i, j, s) }.toDF("i", "j", "s")
    val got = CovarianceStream.pc1FromMoments(momentsDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // direct q300-style computation on the same vectors
    val df = vecs.toDF("vec_id", "embedding")
    val y = df.select(col("vec_id"),
        posexplode(graft.functions.VectorFunctions.quantize(col("embedding")))
          .as(Seq("d", "x")))
      .select(col("vec_id"), (col("d") + 1).cast("long").as("dim"), col("x"))
    val mu = y.groupBy("dim")
      .agg(floor(sum("x").cast("double") / count(lit(1))).cast("long").as("m"))
    val yc = y.join(mu, "dim").select(col("vec_id"), col("dim"),
      (col("x") - col("m")).as("y"))
    def iterate(v: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val proj = yc.join(v, "dim").groupBy("vec_id")
        .agg(sum(col("y") * col("v")).as("s"))
      val w = yc.join(proj, "vec_id").groupBy("dim")
        .agg(sum(col("y") * col("s")).as("w"))
      val mw = w.agg(max(abs(col("w"))).as("mw"))
      w.crossJoin(mw).select(col("dim"),
        floor(lit(1000.0) * col("w") / col("mw")).cast("long").as("v"))
    }
    val want = iterate(iterate(mu.select(col("dim"), lit(1000L).as("v"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, "moment-derived PC1 must equal the direct iteration")
    assert(want.values.map(math.abs).max == 1000L, "rescale pins max |v| at 1000")
  }
}
