package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X283 — ORC interchange: byte-exact round-trip, predicate pushdown
  * into the ORC reader, column pruning in the read schema, and
  * partition pruning on directory keys — the same scan contracts the
  * parquet path pins. */
class OrcInterchangeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("round-trip: parquet-born table -> ORC -> identical rows") {
    val docs = graft.Tables.documents(spark, sfDir)
    val path = tmp()
    OrcInterchange.write(docs, path)
    val back = OrcInterchange.read(spark, path)
    assert(back.schema.fieldNames.sorted.sameElements(docs.schema.fieldNames.sorted))
    assert(back.count() == docs.count())
    assert(docs.exceptAll(back.select(docs.columns.map(col): _*)).isEmpty &&
      back.select(docs.columns.map(col): _*).exceptAll(docs).isEmpty,
      "ORC round-trip must be row-exact")
  }

  test("filter pushdown and column pruning reach the ORC scan") {
    val docs = graft.Tables.documents(spark, sfDir)
    val path = tmp()
    OrcInterchange.write(docs, path)
    val q = OrcInterchange.read(spark, path)
      .filter(col("n_chars") > 200).select("doc_id", "n_chars")
    val scan = collectAllPlans(executedPlan(q))
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan in the ORC plan"))
    assert(scan.metadata.get("PushedFilters").exists(_.contains("GreaterThan(n_chars")),
      s"n_chars filter must push into the ORC reader: ${scan.metadata.get("PushedFilters")}")
    val read = scan.metadata.getOrElse("ReadSchema", "")
    assert(read.contains("doc_id") && read.contains("n_chars") && !read.contains("text"),
      s"ORC read schema must prune the text column: $read")
  }

  test("partition pruning on directory keys opens only the asked partitions") {
    val docs = graft.Tables.documents(spark, sfDir)
    val path = tmp()
    OrcInterchange.write(docs, path, partitionCols = Seq("lang"))
    val q = OrcInterchange.read(spark, path).filter(col("lang") === "en")
    val scan = collectAllPlans(executedPlan(q))
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
      s"lang must be a partition filter: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"only lang=en may be opened, got ${scan.selectedPartitions.partitionCount}")
  }

  private def tmp(): String =
    Files.createTempDirectory("graft-orc").toString
}
