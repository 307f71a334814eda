package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** X283 — columnar ORC interchange: the second columnar format a data
  * platform actually has to exchange with (Hive/Trino-era warehouses
  * hand over ORC, not parquet). Spark's native ORC source gives the
  * same scan-level contracts as the parquet path — predicate pushdown
  * into the reader, column pruning, partition pruning on directory
  * keys — and the spec pins all three plus byte-exact round-trip, so
  * a 100 TB ORC handoff reads with the same I/O discipline as the
  * native tables (`graft.Tables`).
  *
  * Design rules mirror [[TextSources]]: writes are explicit
  * (compression, partition keys), reads take the producing side's
  * layout as-is — no schema inference pass, ORC files carry their
  * schema.
  */
object OrcInterchange {

  /** Write `df` as ZSTD ORC under `path`, optionally directory-
    * partitioned by `partitionCols` (the same calendar/tenant pruning
    * keys as [[DatePartitioning]]). */
  def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** Read an ORC dataset (file-carried schema; partition columns are
    * discovered from the directory layout). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
