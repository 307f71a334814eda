package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** X177 — schema-evolution tolerant scans: files written across pipeline
  * versions read as one frame, absent columns as NULLs, canonical-contract
  * projection, pushdown intact. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def evolvedDir(): String = {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // v1 files: (id, v)
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // v2 files: (id, v, tag) — column added mid-life
    Seq((3L, 30L, "a"), (4L, 40L, "b")).toDF("id", "v", "tag")
      .write.mode("append").parquet(dir)
    dir
  }

  test("mergeSchema read: footer union, v1 rows read added column as NULL") {
    val df = SchemaEvolution.readEvolved(spark, evolvedDir())
    assert(df.columns.toSet == Set("id", "v", "tag"))
    val rows = df.orderBy("id")
      .select("id", "tag").as[(Long, Option[String])].collect()
    assert(rows.toSeq == Seq(1L -> None, 2L -> None, 3L -> Some("a"), 4L -> Some("b")))
  }

  test("conform: missing canonical columns as typed NULLs, extras dropped, order fixed") {
    val canonical = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("tag", StringType), StructField("score", LongType)))
    val df = SchemaEvolution.readConformed(spark, evolvedDir(), canonical)
    assert(df.columns.toSeq == Seq("id", "v", "tag", "score"))
    assert(df.schema("score").dataType == LongType)
    assert(df.filter(col("score").isNotNull).count() == 0)
    // a frame with an EXTRA column conforms by dropping it
    val extra = Seq((9L, 90L, "x", 1L, "junk"))
      .toDF("id", "v", "tag", "score", "debug")
    assert(SchemaEvolution.conform(extra, canonical).columns.toSeq ==
      Seq("id", "v", "tag", "score"))
  }

  test("pushdown survives the merged scan: filter on a common column prunes") {
    val df = SchemaEvolution.readEvolved(spark, evolvedDir()).filter(col("id") === 3L)
    assert(df.select("v").as[Long].collect().toSeq == Seq(30L))
    val scans = collectAllPlans(executedPlan(df)).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.head.metadata("PushedFilters").contains("IsNotNull(id)"),
      s"expected pushed filters, got ${scans.map(_.metadata.get("PushedFilters"))}")
  }
}
