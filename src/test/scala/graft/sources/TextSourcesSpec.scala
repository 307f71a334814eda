package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.SparkSpec

/** JSONL/CSV ingest contracts: schema-first reads, malformed lines split
  * into the bad-record channel (never dropped, never fatal), clean lines
  * typed. */
class TextSourcesSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("JSONL: good lines typed, malformed lines captured with raw content") {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("part0.jsonl"),
      """{"doc_id": 1, "text": "alpha beta"}
        |this is not json at all
        |{"doc_id": 2, "text": "gamma"}
        |{"doc_id": "not_a_number", "text": "delta"}
        |""".stripMargin)
    val (good, bad) = TextSources.splitBadRecords(
      TextSources.readJsonl(spark, dir.toString, schema))
    import spark.implicits._
    val g = good.as[(Long, String)].collect().sortBy(_._1)
    assert(g.toSeq == Seq((1L, "alpha beta"), (2L, "gamma")))
    val b = bad.collect().map(_.getAs[String](TextSources.CorruptCol))
    assert(b.length == 2)
    assert(b.exists(_.contains("not json")))
    assert(b.exists(_.contains("not_a_number")), "type-mismatch line must be captured, not nulled")
    assert(!good.columns.contains(TextSources.CorruptCol))
  }

  test("CSV: header respected, arity/type-broken rows captured") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("part0.csv"),
      """doc_id,text
        |1,alpha
        |oops_no_number,beta
        |2,gamma
        |""".stripMargin)
    val (good, bad) = TextSources.splitBadRecords(
      TextSources.readCsv(spark, dir.toString, schema))
    import spark.implicits._
    assert(good.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "gamma")))
    assert(bad.collect().map(_.getAs[String](TextSources.CorruptCol)).toSeq ==
      Seq("oops_no_number,beta"))
  }

  test("ORC: write/read round-trip, filter pushdown reaches the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val src = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    TextSources.writeOrc(src, dir)
    val back = TextSources.readOrc(spark, dir, schema)
    assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // pushdown: the doc_id predicate must reach the ORC scan, not a
    // post-scan Filter alone
    val filtered = back.filter(col("doc_id") === 2L)
    val scan = executedPlan(filtered).collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metadata.get("PushedFilters").exists(_.contains("doc_id")),
      s"expected doc_id in PushedFilters: ${scan.metadata.get("PushedFilters")}")
    assert(filtered.as[(Long, String)].collect().toSeq == Seq((2L, "beta")))
  }
}
