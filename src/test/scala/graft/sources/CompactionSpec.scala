package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X289 — small-file compaction: the plan bin-packs deterministically,
  * the rewrite preserves rows exactly and collapses the file count,
  * and oversized files get their own group. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-compact").toString

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("plan groups files in name order without exceeding the target (unless single-file)") {
    val in = tmp()
    // 8 small files of ~equal size
    (1 to 8).foreach { i =>
      Seq.tabulate(500)(j => (i.toLong * 1000 + j, s"row $i $j"))
        .toDF("id", "payload").coalesce(1)
        .write.mode("append").parquet(in)
    }
    val nIn = parquetFiles(in).length
    assert(nIn == 8, s"append-per-batch must leave 8 files, got $nIn")
    val oneSize = parquetFiles(in).map(_.length).max
    val plan = Compaction.plan(spark, in, targetBytes = oneSize * 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(plan.length == 8)
    // groups hold ~3 files each: 8 files / 3-per-group = 3 groups
    val groups = plan.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(groups.size == 3, s"expected 3 groups, got $groups")
    assert(groups.values.forall(_ <= oneSize * 3 + oneSize),
      "no group may blow past target by more than one file")
    // name order: file names within a group are contiguous in the sort
    val sortedNames = plan.sortBy(_._2).map(_._1)
    assert(sortedNames.sameElements(sortedNames.sorted),
      "group ids must be monotone in file-name order")
  }

  test("compact preserves rows exactly and collapses the file count") {
    val in = tmp(); val out = tmp()
    (1 to 6).foreach { i =>
      Seq.tabulate(400)(j => (i.toLong * 1000 + j, j.toLong % 7))
        .toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
    }
    val src = spark.read.parquet(in)
    val size = parquetFiles(in).map(_.length).max
    val (nGroups, nFiles, _) = Compaction.compact(spark, in, out, size * 3)
    assert(nFiles == 6 && nGroups == 2, s"got $nGroups groups / $nFiles files")
    val back = Compaction.read(spark, out)
    assert(back.count() == src.count())
    assert(src.exceptAll(back.select("id", "v")).isEmpty &&
      back.select("id", "v").exceptAll(src).isEmpty, "row-exact rewrite")
    // each group directory holds exactly one data file
    (0L until nGroups).foreach { g =>
      val n = parquetFiles(s"$out/group=$g").length
      assert(n == 1, s"group $g must be one file, got $n")
    }
  }

  test("a file larger than the target gets its own group") {
    val in = tmp()
    Seq.tabulate(20000)(j => (j.toLong, s"big payload row $j with some width"))
      .toDF("id", "payload").coalesce(1).write.mode("append").parquet(in)
    Seq.tabulate(50)(j => (100000L + j, "small")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(in)
    val sizes = parquetFiles(in).map(_.length).sorted
    val target = sizes.head * 2 // smaller than the big file
    val plan = Compaction.plan(spark, in, target).collect()
    assert(plan.map(_.getLong(0)).distinct.length == 2,
      "big file alone + small file alone = 2 groups")
  }
}
