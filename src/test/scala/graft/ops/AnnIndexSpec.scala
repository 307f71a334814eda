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

  test("k-means training balances inverted lists under a degenerate-seed skew") {
    import spark.implicits._
    // 4 tight, well-separated clusters of 50; ids ordered so ALL of the
    // lowest ids (the raw seed) fall inside cluster 0 — the adversarial
    // corpus where an untrained sample quantizer piles each foreign
    // cluster onto one hot inverted list (hot-list scan cost at scale)
    val rnd = new scala.util.Random(7)
    val emb = (for (cl <- 0 until 4; i <- 0 until 50) yield {
      val v = Array.tabulate(8)(d =>
        (if (d == cl * 2) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
      (cl * 50L + i, v.map(_.toFloat).toSeq)
    }).toDF("vec_id", "embedding")
    def maxList(trainRounds: Int): Long = {
      val path = tmp()
      AnnIndex.build(emb, path, nCentroids = 8, trainRounds = trainRounds)
      spark.read.parquet(s"$path/lists").groupBy("bucket").count()
        .agg(max("count")).as[Long].head()
    }
    val untrained = maxList(0)
    val trained = maxList(2)
    assert(trained < untrained,
      s"training must shrink the hottest list: trained=$trained untrained=$untrained")
    // the hottest trained list stays within 2.8x of the ideal 200/8 = 25
    assert(trained <= 70, s"hottest trained list too large: $trained")
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
