package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** X196 — online partition-layout migration with dual-read cutover:
  * re-layout a day-partitioned dataset (`day=<d>/`) into a finer layout
  * (`day=<d>/source=<s>/`) WITHOUT a stop-the-world rewrite — days
  * migrate one at a time (each an idempotent per-day overwrite into the
  * new root), a `_MIGRATED` manifest records the cutover set with an
  * atomic replace, and `dualRead` serves every reader a COMPLETE view
  * throughout: migrated days from the new layout, the rest from the old.
  * When the manifest covers all days the old root can be retired.
  *
  * Why it exists: partition evolution is a table-format headline feature
  * (Iceberg partition specs); on plain parquet the same contract is a
  * manifest + two scans with day-disjoint pruning — this module is that
  * stand-in, next to [[DatePartitioning]]'s backfill (`relandDays`) and
  * [[graft.streaming.ViewStore]]'s manifest discipline.
  *
  * Scale: each migration step touches exactly one day's files; dualRead
  * pushes the day filter into BOTH scans (directory-level pruning), so
  * the cost of being mid-migration is one extra file listing, not a
  * second data pass.
  */
object PartitionMigration {

  private val Manifest = "_MIGRATED"

  /** Days already migrated into `newDir` (empty set if none). */
  def migratedDays(newDir: String): Set[Long] = {
    val f = new java.io.File(newDir, Manifest)
    if (!f.exists()) Set.empty
    else java.nio.file.Files.readString(f.toPath).trim.split("[,\\s]+")
      .filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** Migrate `days` from the day-partitioned `oldDir` into the
    * (day, `subCol`)-partitioned `newDir`. Idempotent per day (overwrite
    * of that day's subtree via dynamic partition overwrite); the
    * manifest is replaced atomically AFTER the data lands, so a crash
    * mid-migration leaves the day unlisted and dualRead still serves it
    * from the old layout (complete either way).
    *
    * Only days that actually EXIST in `oldDir` enter the manifest: a
    * requested-but-absent day must stay unlisted, because listing it
    * would make [[dualRead]]'s anti-filter hide the day from the old
    * layout forever — if it lands there later (e.g. a
    * [[DatePartitioning.relandDays]] backfill), readers would silently
    * lose it (round-5 ADVICE).
    *
    * Re-landing INTO A MIGRATED DAY of the old layout is the one flow
    * that still needs an explicit step: the day is already listed, so
    * dualRead serves the (now stale) new-layout copy. Call
    * `migrateDays(..., force = true)` for those days after the reland —
    * `force` re-copies listed days (the per-day dynamic overwrite makes
    * it idempotent), restoring the complete-view contract. */
  def migrateDays(spark: SparkSession, oldDir: String, newDir: String,
      days: Seq[Long], subCol: String = "source", force: Boolean = false): Unit = {
    // present days come from a FILESYSTEM LISTING of oldDir's `day=*`
    // partition directories, not `distinct()` over the partition
    // column: Spark 3 removed OptimizeMetadataOnlyQuery (SPARK-26709 —
    // it returned wrong results), so the distinct ran a real scan job
    // over the whole old layout on every call, and a day present only
    // as an empty directory (e.g. a reland target created before its
    // files commit) was invisible to it (round-6 ADVICE). The listing
    // is one directory read — the same source partition discovery uses.
    // …via the Hadoop FileSystem API, not java.io.File: File.listFiles()
    // returns null for any non-local URI (hdfs://, s3a://, even file:),
    // which silently turned migrateDays into a no-op off the local disk
    // (round-7 ADVICE). getFileSystem resolves the scheme's store and
    // listStatus is still the same single directory read.
    val oldPath = new org.apache.hadoop.fs.Path(oldDir)
    val fs = oldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val present: Set[Long] =
      (if (fs.exists(oldPath)) fs.listStatus(oldPath) else Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("day="))
        .flatMap(st => scala.util.Try(st.getPath.getName.stripPrefix("day=").toLong).toOption)
        .toSet
    val requested = if (force) days else days.filterNot(migratedDays(newDir))
    val toDo = requested.filter(present)
    if (toDo.isEmpty) return
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.parquet(oldDir)
        .filter(col("day").isin(toDo.map(Long.box): _*))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("day", subCol)
        .parquet(newDir)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val all = (migratedDays(newDir) ++ toDo).toSeq.sorted.mkString(",")
    val tmp = new java.io.File(newDir, s".$Manifest.tmp")
    java.nio.file.Files.writeString(tmp.toPath, all)
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(newDir, Manifest).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Complete view mid-migration: migrated days from the new layout,
    * everything else from the old. Both branches carry the day filter,
    * so partition pruning applies on each side. */
  def dualRead(spark: SparkSession, oldDir: String, newDir: String): DataFrame = {
    val done = migratedDays(newDir)
    val old = spark.read.parquet(oldDir)
    if (done.isEmpty) old
    else {
      val boxed = done.toSeq.sorted.map(Long.box)
      val neu = spark.read.parquet(newDir).filter(col("day").isin(boxed: _*))
      old.filter(!col("day").isin(boxed: _*))
        .unionByName(neu.select(old.columns.map(col).toIndexedSeq: _*))
    }
  }
}
