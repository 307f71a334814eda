package graft.streaming

/** Shared generation-per-batch persistence discipline of the snapshot
  * maintainers (SketchStream, RetractStream, QualityMonitorStream,
  * RollingDistinctStream, BloomScreenStream, SuggestStream,
  * ComponentStream, PrioritySampleStream): each micro-batch writes a
  * fresh `gen-<epochMillis>-<batchId>/` parquet snapshot, then
  * atomically rewrites the `_CURRENT` pointer (`<batchId>:<gen>`), so
  * readers always see a complete snapshot, a crash mid-write leaves the
  * previous generation live, and an exact re-delivery (batchId ≤
  * pointer's) is skipped by the guard.
  *
  * [[flip]] also SWEEPS superseded generations (round-5 ADVICE): a
  * long-running stream otherwise grows the state path by one full
  * snapshot per batch without bound. The sweep keeps the new current
  * generation plus the [[KeepPreviousGens]] most recent older ones —
  * a reader that resolved the pointer just before the flip can still
  * finish its scan against the previous generation (same retention
  * reasoning as [[ViewStore]]'s gc) — and also removes orphaned
  * generations (written but never flipped to, e.g. a crash between
  * write and flip).
  */
private[streaming] object GenState {

  private val Pointer = "_CURRENT"

  /** Generations retained BESIDES the current one. 1 covers any reader
    * that resolved the pointer immediately before the latest flip. */
  val KeepPreviousGens = 1

  /** The pointer's `<gen>` dir name, if a flip ever happened. */
  def currentGen(statePath: String): Option[String] = {
    val ptr = new java.io.File(statePath, Pointer)
    if (ptr.exists())
      Some(java.nio.file.Files.readString(ptr.toPath).trim.split(':')(1))
    else None
  }

  /** The pointer's batchId guard (−1 before the first flip). */
  def lastBatchId(statePath: String): Long = {
    val ptr = new java.io.File(statePath, Pointer)
    if (ptr.exists())
      java.nio.file.Files.readString(ptr.toPath).trim.split(':')(0).toLong
    else -1L
  }

  /** Atomically flip the pointer to `gen` (tmp write + ATOMIC_MOVE),
    * then sweep superseded generation dirs. Call AFTER `gen`'s data is
    * fully written. */
  def flip(statePath: String, batchId: Long, gen: String): Unit = {
    val tmp = new java.io.File(statePath, s".$Pointer.tmp")
    java.nio.file.Files.writeString(tmp.toPath, s"$batchId:$gen")
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(statePath, Pointer).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    sweep(statePath, gen)
  }

  /** Delete generation dirs other than `current` and the
    * [[KeepPreviousGens]] most recent others. `gen-<millis>-<batchId>`
    * names sort chronologically (fixed-width epoch millis), so the
    * lexicographic order IS the write order. */
  private def sweep(statePath: String, current: String): Unit = {
    val root = new java.io.File(statePath)
    val gens = Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen-") && f.getName != current)
      .sortBy(_.getName)
    gens.dropRight(KeepPreviousGens).foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete(); ()
  }
}
