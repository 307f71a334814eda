package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fused [[CdcChunks]] expression bit-identical to the composed
  * declarative form it replaced in q144 (posexplode → cut flag → per-doc
  * exclusive prefix-sum window → groupBy chunk with sorted collect). */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val CutMod = graft.queries.SearchQueries.CdcCutMod

  private def composedChunks(docs: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .withColumn("cut",
        (conv(substring(md5(col("token")), 1, 2), 16, 10).cast("long") % CutMod === 0L)
          .cast("long"))
      .withColumn("chunk_id", coalesce(sum("cut").over(w), lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(md5(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")))).as("chunk_hash"),
        count(lit(1)).as("chunk_len"))
      .select("doc_id", "chunk_id", "chunk_hash", "chunk_len")
  }

  private def fusedChunks(docs: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(call_function(
        GraftFunctions.CdcChunksName, col("t"), lit(CutMod.toInt))).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.chunk_hash").as("chunk_hash"), col("c.chunk_len").as("chunk_len"))
  }

  test("fused CdcChunks == composed window form, bit-identical chunk table") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 50).map(i => s"tok$i")
    val docs = (1L to 60L).map { id =>
      val len = rnd.nextInt(40) + 1 // >= 1 token (empty docs emit nothing, both forms)
      (id, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val fused = fusedChunks(docs)
    val composed = composedChunks(docs)
    assert(fused.except(composed).count() == 0 && composed.except(fused).count() == 0,
      "fused CDC chunk table diverges from the composed form")
  }

  test("chunk boundaries: cut token ends its chunk; trailing run forms a final chunk") {
    GraftFunctions.register(spark)
    // find one cutting and one non-cutting token deterministically
    def cuts(tok: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))(0) & 0xFF
      d % CutMod == 0
    }
    val cutTok = (0 until 1000).map(i => s"c$i").find(cuts).get
    val plain = (0 until 1000).map(i => s"p$i").find(t => !cuts(t)).get
    val docs = Seq((1L, s"$plain $cutTok $plain $plain")).toDF("doc_id", "text")
    val rows = fusedChunks(docs).orderBy("chunk_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 0L && rows(0).getLong(3) == 2L) // [plain, cutTok]
    assert(rows(1).getLong(1) == 1L && rows(1).getLong(3) == 2L) // trailing [plain, plain]
  }
}
