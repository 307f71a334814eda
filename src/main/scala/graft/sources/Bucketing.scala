package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location — the storage-level lever that removes the
  * join shuffle entirely: two tables written with the SAME bucket key and
  * bucket count join bucket-to-bucket, no Exchange on either side
  * (BucketingSpec pins the plan). At 100 TB this is the difference between
  * re-shuffling the fact table on every join and paying the layout cost
  * once at write time — the parquet/warehouse analogue of the reference's
  * keyed `transactions-view` collection, where the store IS the layout.
  *
  * `sortBy` within buckets additionally removes the sort before a
  * sort-merge join and keeps per-key scans sequential.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed by `key` into
    * `buckets` files per partition, optionally sorted within buckets. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
