package graft.ops

import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.functions.VectorFunctions

/** Round-4 wave-2 corpus operators: pattern scrub, exact-substring
  * duplicate spans, DSIR importance weights, JL random projection. */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- scrub

  test("scrub: planted PII is counted and rewritten to placeholders") {
    val docs = Seq(
      (0L, "contact bob.smith+x@example.co.uk or 10.0.0.1 today"),
      (1L, "call +39 06 1234 5678 twice: +39 06 1234 5678"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Scrub.scrub(docs, Seq(Scrub.Email, Scrub.Ipv4, Scrub.Phone))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_email") == 1L)
    assert(out(0L).getAs[Long]("n_ipv4") == 1L)
    assert(out(0L).getAs[String]("clean_text") ==
      "contact <EMAIL> or <IP> today")
    assert(out(1L).getAs[Long]("n_phone") == 2L)
    assert(out(1L).getAs[String]("clean_text") == "call <PHONE> twice: <PHONE>")
    assert(out(2L).getAs[Long]("n_email") == 0L)
    assert(out(2L).getAs[String]("clean_text") == "nothing sensitive here")
  }

  test("scrub: rules apply in order over the previous rule's output") {
    // the email is also a phone-ish digit run after the '@' is gone? no —
    // but an IP inside an email must NOT be double-replaced: email wins
    val docs = Seq((0L, "root@10.0.0.1.example.com pinged 10.0.0.2")).toDF("doc_id", "text")
    val out = Scrub.scrub(docs, Seq(Scrub.Email, Scrub.Ipv4)).collect()(0)
    assert(out.getAs[String]("clean_text") == "<EMAIL> pinged <IP>")
    // counts are per-rule detections on the ORIGINAL text
    assert(out.getAs[Long]("n_email") == 1L)
    assert(out.getAs[Long]("n_ipv4") == 2L)
  }

  test("scrub: stateless pass runs unchanged under Structured Streaming") {
    // no shuffle, no state — the SAME operator body serves the continuous
    // redaction stage of an ingest stream (append mode, no watermark needed)
    implicit val ctx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = Scrub.scrub(ms.toDF().toDF("doc_id", "text"),
        Seq(Scrub.Email, Scrub.Ipv4))
      .writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    try {
      ms.addData(Seq((1L, "mail a@b.io now"), (2L, "plain")))
      q.processAllAvailable()
      ms.addData(Seq((3L, "ping 10.0.0.7")))
      q.processAllAvailable()
      val out = spark.table("scrub_stream")
        .collect().map(r => r.getLong(0) -> r.getAs[String]("clean_text")).toMap
      assert(out == Map(1L -> "mail <EMAIL> now", 2L -> "plain",
        3L -> "ping <IP>"))
    } finally q.stop()
  }

  // ------------------------------------------------------------ dup spans

  test("dup spans: a shared 8+-token span is covered; unique docs score 0") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (0L, s"unique lead-in words here $shared"),
      (1L, s"$shared and a different unique tail altogether"),
      (2L, "totally unrelated content with no overlap at all whatsoever now")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, n = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // the 10-token shared span yields 3 shared 8-gram starts, 10 covered tokens
    assert(out(0L).getAs[Long]("n_dup_grams") == 3L)
    assert(out(0L).getAs[Long]("dup_tokens") == 10L)
    assert(out(1L).getAs[Long]("dup_tokens") == 10L)
    assert(out(0L).getAs[Long]("dup_frac_x1k") ==
      1000L * 10L / out(0L).getAs[Long]("n_tokens"))
    assert(out(2L).getAs[Long]("n_dup_grams") == 0L)
    assert(out(2L).getAs[Long]("dup_frac_x1k") == 0L)
  }

  test("dup spans: repeats WITHIN one doc don't count (cross-document only)") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (0L, s"$span then again $span"),
      (1L, "другой unrelated text entirely for the second document here")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(docs, n = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_dup_grams") == 0L)
    assert(out(0L).getAs[Long]("dup_tokens") == 0L)
  }

  // ----------------------------------------------------------- projection

  test("JL projection: md5 sign matrix is ±1 and deterministic") {
    val m = VectorFunctions.md5SignMatrix("rp4", 16, 64)
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(s => s == 1L || s == -1L))
    assert(m == VectorFunctions.md5SignMatrix("rp4", 16, 64))
    // not degenerate: both signs occur
    assert(m.flatten.toSet == Set(1L, -1L))
  }

  test("JL projection: projections are the signed sums of quantized coords") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    val signs = md5SignMatrix("rp4", 4, 3)
    // exact-representable floats so quantize is exactly x*1000
    val v = Seq(1.0f, 2.0f, -3.0f)
    val df = Seq((7L, v)).toDF("vec_id", "embedding")
    val mat = array(signs.map(row => typedLit(row)): _*)
    val out = df
      .select(col("vec_id"), quantize(col("embedding")).as("vq"))
      .select(col("vec_id"), col("vq"), posexplode(mat).as(Seq("rp_dim", "sv")))
      .select(col("rp_dim"), qdot(col("vq"), col("sv")).as("proj"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = signs.map(row =>
      row.zip(Seq(1000L, 2000L, -3000L)).map { case (s, x) => s * x }.sum)
    assert((0 until 4).forall(j => out(j) == expected(j)))
  }

  test("temperature mixture: sqrt-weighted allocation, hand-computed") {
    import org.apache.spark.sql.functions._
    // token counts per source: a=100 (w=10), b=400 (w=20), c=2500 (w=50)
    // w_total=80 -> allocs 125000 / 250000 / 625000 of the 1M budget
    def doc(n: Int) = (0 until n).map(i => s"t$i").mkString(" ")
    val rows =
      (0 until 2).map(i => (i.toLong, doc(50), "en", "a", 1L)) ++
      (0 until 4).map(i => (10L + i, doc(100), "en", "b", 1L)) ++
      (0 until 5).map(i => (20L + i, doc(500), "en", "c", 1L))
    val dir = java.nio.file.Files.createTempDirectory("tmix").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.CorpusQueries.q107_temperature_mixture(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_tokens") == 100L)
    assert(out("a").getAs[Long]("w") == 10L)
    assert(out("a").getAs[Long]("alloc_tokens") == 125000L)
    assert(out("b").getAs[Long]("alloc_tokens") == 250000L)
    assert(out("c").getAs[Long]("alloc_tokens") == 625000L)
    // temperature flattening: a's alloc share (12.5%) > its raw share (3.3%)
    assert(out("a").getAs[Long]("epochs_x1k") == 1250000L)
    assert(out.values.map(_.getAs[Long]("alloc_tokens")).sum <= 1000000L)
  }
}
