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

  test("append: new vectors land in their frozen-centroid lists; queries see old + new") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") % 2 === 0)
    val fresh = emb.filter(col("vec_id") % 2 === 1)
    val path = tmp()
    AnnIndex.build(old, path, nCentroids = 8)
    val centBefore = spark.read.parquet(s"$path/_centroids").collect().toSet
    AnnIndex.append(fresh, path)
    // centroids are FROZEN by contract (no retrain on append)
    assert(spark.read.parquet(s"$path/_centroids").collect().toSet == centBefore)
    // every appended row sits in the list of its argmax-dot centroid
    // against those frozen centroids — recompute the assignment
    // independently and compare
    val lists = spark.read.parquet(s"$path/lists")
    val freshIds = fresh.select("vec_id").as[Long].collect().toSet
    val stored = lists.filter(col("neighbor_id").isin(freshIds.toSeq: _*))
      .select(col("neighbor_id"), col("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(stored.keySet == freshIds, "every appended vector must be stored exactly once")
    val cent = spark.read.parquet(s"$path/_centroids")
    val expected = fresh
      .select(col("vec_id"), graft.functions.VectorFunctions.quantize(col("embedding")).as("cv"))
      .crossJoin(broadcast(cent))
      .withColumn("cdot", call_function(
        graft.expressions.GraftFunctions.DotLong, col("cv"), col("centv")))
      .groupBy("vec_id")
      .agg(max(struct(col("cdot"), (-col("cent_id")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(stored == expected, "append must use the frozen-centroid argmax assignment")
    // and queries now reach appended neighbors
    val res = AnnIndex.query(spark, path, queries(10), k = 5, nProbe = 4)
    assert(res.filter(col("neighbor_id") % 2 === 1).count() > 0,
      "appended vectors must be reachable")
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

  test("prefix index with exhaustive probes ≡ q153's brute-force two-stage") {
    // round-6 VERDICT #7: the Matryoshka layout must reproduce q153's
    // exact result when nothing is pruned (nProbe = nCentroids), so the
    // approximate scale path differs from the bench query ONLY by which
    // lists it opens
    import graft.queries.TuningQueries
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = tmp()
    val nCent = 8
    AnnIndex.buildPrefix(emb, path,
      prefixDims = TuningQueries.PrefixDims, nCentroids = nCent)
    val qs = emb.filter(col("vec_id") % TuningQueries.PrefixQueryMod === 0)
    val got = AnnIndex.queryPrefix(spark, path, qs,
        k = TuningQueries.PrefixK, candK = TuningQueries.CandK, nProbe = nCent)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = TuningQueries.q153_prefix_ann(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want,
      s"exhaustive-probe prefix index must equal the brute two-stage; " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("prefix query prunes partitions AND reads only prefix bytes in the coarse scan") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = tmp()
    AnnIndex.buildPrefix(emb, path, prefixDims = 16, nCentroids = 16)
    val result = AnnIndex.queryPrefix(spark, path, queries(2),
      k = 3, candK = 10, nProbe = 2)
    val scans = collectAllPlans(executedPlan(result))
      .collect { case s: FileSourceScanExec => s }
      .filter(_.output.exists(_.name == "neighbor_id"))
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(_.name == "bucket")),
        s"every lists scan must partition-prune on bucket: ${s.partitionFilters}")
      assert(s.selectedPartitions.partitionCount <= 4,
        s"≤4 of 16 lists opened, got ${s.selectedPartitions.partitionCount}")
    }
    // column pruning: the coarse scan streams cp WITHOUT the full
    // vector column — the 1/4-of-the-bytes contract
    val coarseScan = scans.find(s =>
      s.output.exists(_.name == "cp") && !s.output.exists(_.name == "cv"))
    assert(coarseScan.isDefined,
      s"coarse stage must read only prefix bytes; scans read " +
        s"${scans.map(_.output.map(_.name).mkString("[", ",", "]"))}")
  }
}
