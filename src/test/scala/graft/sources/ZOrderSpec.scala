package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout: correctness of the Morton key and the measurable
  * data-skipping win — a 2-D box scan over the z-clustered layout must
  * read far fewer rows out of parquet (row-group pruning via min/max
  * stats) than the same scan over a one-dimensionally sorted layout. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (255L, 255L))
      .toDF("a", "b")
      .select(ZOrder.morton2(col("a"), col("b"), 8).as("z"))
    // morton(5=101, 3=011) = b's bits at odd positions, a's at even:
    // a:101 -> 010001, b:011 -> 001010 shifted -> z = 0b011011 = 27
    assert(df.as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 27L, 65535L))
  }

  test("morton2 is monotone within an aligned box (locality sanity)") {
    // all codes of an aligned 4x4 box are contiguous: [z0, z0+16)
    val codes = (0 until 4).flatMap(a => (0 until 4).map(b => (a + 8L, b + 4L)))
      .toDF("a", "b")
      .select(ZOrder.morton2(col("a"), col("b"), 8).as("z"))
      .as[Long].collect().sorted
    assert(codes.last - codes.head == 15 && codes.distinct.length == 16)
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = collectAllPlans(df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collect { case s: FileSourceScanExec => s }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("2-D box scan reads far fewer rows from the z-ordered layout") {
    // 2-D uniform grid decorrelated from row order: 64x64 cells, 128k rows
    val n = 1 << 17
    val base = spark.range(n.toLong)
      .select(col("id"),
        pmod(xxhash64(col("id")), lit(64)).as("user_bucket"),
        pmod(xxhash64(col("id") * 7 + 13), lit(64)).as("day_bucket"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // control: the natural one-dimension layout (sorted by arrival id)
    base.repartitionByRange(32, col("id"))
      .sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$dir/linear")
    ZOrder.writeZOrdered(base, s"$dir/zorder", "user_bucket", "day_bucket",
      bits = 6, nFiles = 32)

    def box(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("user_bucket").between(8, 15) &&
          col("day_bucket").between(16, 23))

    val (zRows, linRows) = (scanRows(box(s"$dir/zorder")), scanRows(box(s"$dir/linear")))
    val expected = box(s"$dir/linear").count()
    assert(box(s"$dir/zorder").count() == expected, "layouts must agree on results")
    // the aligned 8x8 box is ~1.5% of the grid; the z layout reads a
    // handful of row groups, the id-sorted layout reads everything
    assert(linRows.toDouble / n > 0.9,
      s"control layout should scan ~all rows, scanned $linRows of $n")
    assert(zRows * 4 <= linRows,
      s"z-order should prune at least 4x vs linear, got z=$zRows lin=$linRows")
  }
}
