package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** X177 — schema-evolution tolerant scans over a parquet directory whose
  * files were written across pipeline versions (columns added over time —
  * the normal life of a landed event log; the reference's document store
  * evolves the same way, absent fields simply missing from old documents,
  * SURVEY.md §1.2).
  *
  * Two layers:
  *
  *   - `readEvolved`: one directory, files with heterogeneous (compatible)
  *     schemas. `mergeSchema=true` makes the footer-union one LISTING-time
  *     reconciliation (per-file footers, no data read); rows from files
  *     missing a column read it as NULL — exactly the Mongo absent-field
  *     semantics. The scan stays a single pushdown-capable parquet scan.
  *   - `conform`: project ANY frame onto a declared canonical contract —
  *     missing columns materialize as typed NULLs, extra columns are
  *     DROPPED (a renamed/retyped column thus surfaces as an all-null
  *     canonical column, which the X91 data-quality constraints catch
  *     loudly rather than a downstream job failing at column resolution).
  *
  * Scale note: `mergeSchema` reads every file footer at listing time —
  * cheap next to the data, but at millions of files the right call is a
  * declared canonical schema (skip the footer union entirely); `conform`
  * over a plain schema-first read is exactly that path, so both regimes
  * share one code path downstream.
  */
object SchemaEvolution {

  /** Read a parquet directory written across schema versions: per-file
    * footer union, absent columns as NULLs, single scan. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Conform `df` to the canonical contract: canonical column order and
    * types, missing columns as typed NULLs, extras dropped. */
  def conform(df: DataFrame, canonical: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(canonical.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Evolution-tolerant read straight onto the contract. */
  def readConformed(spark: SparkSession, path: String, canonical: StructType): DataFrame =
    conform(readEvolved(spark, path), canonical)
}
