package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Persisted IVF index: query results must equal the in-memory ivfTopK,
  * and the probe set must prune list partitions at the scan. */
class AnnIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-annindex").toString

  private def queries(n: Int) =
    graft.Tables.embeddings(spark, sfDir).orderBy(col("vec_id")).limit(n)

  test("index query ≡ in-memory ivfTopK (same quantizer, same params)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = tmp()
    AnnIndex.build(emb, path, nCentroids = 16)
    val q = queries(20)
    val fromIndex = AnnIndex.query(spark, path, q, k = 5, nProbe = 4)
    val inMemory = Ann.ivfTopK(q, emb, k = 5, nCentroids = 16, nProbe = 4)
    assert(fromIndex.exceptAll(inMemory).isEmpty &&
      inMemory.exceptAll(fromIndex).isEmpty)
    assert(fromIndex.count() == 20L * 5)
  }

  test("the probe set prunes inverted-list partitions at file listing") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = tmp()
    AnnIndex.build(emb, path, nCentroids = 16)
    val result = AnnIndex.query(spark, path, queries(2), k = 3, nProbe = 2)
    val scans = collectAllPlans(executedPlan(result))
      .collect { case s: FileSourceScanExec => s }
    val listScan = scans.find(_.output.exists(_.name == "neighbor_id")).get
    assert(listScan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"bucket probe must be a PARTITION filter: ${listScan.partitionFilters}")
    val selected = listScan.selectedPartitions.partitionCount
    // 2 queries × 2 probes = at most 4 of the 16 lists opened
    assert(selected <= 4, s"expected ≤4 list partitions scanned, got $selected")
  }
}
