package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** X196 — online partition-layout migration: dual-read completeness at
  * every migration stage, idempotent re-migration, untouched old-layout
  * days byte-stable, full-cutover reads only the new layout. */
class PartitionMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def mkOld(): (String, String) = {
    val oldDir = Files.createTempDirectory("graft-mig-old").toString
    val newDir = Files.createTempDirectory("graft-mig-new").toString + "/out"
    Seq(
      (1L, "a", 10L), (1L, "b", 11L),
      (2L, "a", 20L), (2L, "b", 21L),
      (3L, "a", 30L)
    ).toDF("day", "source", "v")
      .write.partitionBy("day").parquet(oldDir + "/data")
    (oldDir + "/data", newDir)
  }

  private def files(dir: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(base).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        out(base.relativize(p).toString) = java.nio.file.Files.getLastModifiedTime(p).toMillis
    }
    out.toMap
  }

  test("dual-read stays complete through the migration; unmigrated days byte-stable") {
    val (oldDir, newDir) = mkOld()
    val all = spark.read.parquet(oldDir).select("day", "source", "v")
      .as[(Long, String, Long)].collect().sorted.toSeq

    def read() = PartitionMigration.dualRead(spark, oldDir, newDir)
      .select("day", "source", "v").as[(Long, String, Long)].collect().sorted.toSeq

    assert(read() == all, "pre-migration read == full data")
    val before = files(oldDir)
    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(2L))
    assert(PartitionMigration.migratedDays(newDir) == Set(2L))
    assert(read() == all, "mid-migration read == full data")
    assert(files(oldDir) == before, "old layout untouched by migration")
    // the migrated day landed in the finer layout
    assert(new java.io.File(newDir, "day=2/source=a").exists())

    // idempotent: re-migrating day 2 is a no-op, data still complete
    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(2L))
    assert(read() == all)

    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(1L, 3L))
    assert(PartitionMigration.migratedDays(newDir) == Set(1L, 2L, 3L))
    assert(read() == all, "post-cutover read == full data")
  }

  test("absent days never enter the manifest; a later backfill of them stays visible") {
    val (oldDir, newDir) = mkOld()
    // day 9 does not exist yet — migrating (1, 9) must list only 1
    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(1L, 9L))
    assert(PartitionMigration.migratedDays(newDir) == Set(1L),
      "a requested-but-absent day must stay unlisted")
    // day 9 lands in the OLD layout afterwards (the reland/backfill flow)
    Seq((9L, "a", 90L)).toDF("day", "source", "v")
      .write.mode("append").partitionBy("day").parquet(oldDir)
    val got = PartitionMigration.dualRead(spark, oldDir, newDir)
      .select("day", "source", "v").as[(Long, String, Long)].collect().sorted.toSeq
    assert(got.contains((9L, "a", 90L)),
      "the backfilled day must be served from the old layout, not anti-filtered away")
    assert(got.size == 6)
  }

  test("force re-migration refreshes a migrated day after an old-layout reland") {
    val (oldDir, newDir) = mkOld()
    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(2L))
    // day 2 is re-landed in the old layout with an extra row; without a
    // re-migration dualRead serves the stale new-layout copy (2 rows)
    Seq((2L, "c", 22L)).toDF("day", "source", "v")
      .write.mode("append").partitionBy("day").parquet(oldDir)
    assert(PartitionMigration.dualRead(spark, oldDir, newDir)
      .filter(col("day") === 2L).count() == 2, "stale until forced")
    // the documented repair step: force re-copies the listed day
    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(2L), force = true)
    val day2 = PartitionMigration.dualRead(spark, oldDir, newDir)
      .filter(col("day") === 2L).select("source", "v")
      .as[(String, Long)].collect().sorted.toSeq
    assert(day2 == Seq(("a", 20L), ("b", 21L), ("c", 22L)))
  }

  test("dual-read prunes: mid-migration, old-layout scan excludes migrated days") {
    val (oldDir, newDir) = mkOld()
    PartitionMigration.migrateDays(spark, oldDir, newDir, Seq(2L))
    val df = PartitionMigration.dualRead(spark, oldDir, newDir)
    // rows for day 2 come from the new root only: no duplicates
    assert(df.filter(col("day") === 2L).count() == 2)
    assert(df.count() == 5)
  }
}
