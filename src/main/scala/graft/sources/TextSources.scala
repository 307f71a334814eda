package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-first JSONL / CSV readers with explicit bad-record accounting —
  * the ingest face of the engine for the two text formats a crawl /
  * data-vendor pipeline actually delivers. (Parquet is the native format,
  * `graft.Tables`; Kafka envelopes decode via
  * [[graft.cdc.CdcDecode.fromKafkaEnvelope]].)
  *
  * Design rules, both formats:
  *   - ALWAYS an explicit schema. Inference (`inferSchema`, sampled JSON
  *     schema discovery) is a full extra pass over 100 TB and
  *     nondeterministic under sampling; a declared `StructType` makes the
  *     scan single-pass and the plan stable.
  *   - PERMISSIVE + `_corrupt_record`: a malformed line must neither kill
  *     the job (FAILFAST at row 80 billion) nor vanish silently
  *     (DROPMALFORMED) — it lands in the corrupt column, the caller splits
  *     good from bad and OBSERVES the bad count (same bad-record
  *     discipline as the CDC decode path, [[graft.cdc.CdcDecode]]).
  *   - Readers return the raw split; dedup/quality/decontamination stages
  *     compose downstream.
  */
object TextSources {

  val CorruptCol = "_corrupt_record"

  /** JSONL read under `schema` (+ the corrupt column appended). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV (header, `sep`) read under `schema` (+ corrupt column). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      sep: String = ","): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "true")
      .option("sep", sep)
      .csv(path)

  /** ORC read/write round-trip (columnar sibling of parquet — Spark's ORC
    * datasource is built in, `orc-core` ships with the distribution).
    * Same schema-first rule: ORC carries its schema in the footer, but
    * declaring one pins the read to the expected shape (a column drift in
    * delivered files surfaces as nulls the data-quality checks (X91)
    * catch, not as a silently widened scan). Predicate pushdown and
    * column pruning work as for parquet (`spark.sql.orc.filterPushdown`
    * is on by default). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Split a PERMISSIVE read into (good rows without the corrupt column,
    * bad rows). Spark leaves every declared column null AND fills
    * `_corrupt_record` for a malformed line, so the corrupt column is the
    * one discriminator.
    *
    * The bad side keeps the FULL row (raw line in `_corrupt_record`,
    * declared columns null): Spark refuses a query whose only referenced
    * scan column is the internal corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and keeping
    * the typed columns costs nothing, they're null for these rows. */
  def splitBadRecords(df: DataFrame): (DataFrame, DataFrame) = {
    val good = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = df.filter(col(CorruptCol).isNotNull)
    (good, bad)
  }
}
