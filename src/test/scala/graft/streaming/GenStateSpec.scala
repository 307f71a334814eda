package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The generation + pointer-flip + sweep discipline shared by the
  * snapshot maintainers — focused on the crash-window retention
  * semantics the stream specs can't reach: an orphaned generation
  * (written but never flipped to) must not consume the
  * KeepPreviousGens retention slot of the genuinely previous
  * generation a just-before-the-flip reader may still be scanning. */
class GenStateSpec extends AnyFunSuite {

  private def mkGen(root: java.io.File, millis: Long, batchId: Long): String = {
    val name = f"gen-$millis%013d-$batchId"
    val d = new java.io.File(root, name)
    assert(d.mkdirs())
    Files.writeString(new java.io.File(d, "part-0.parquet").toPath, "x")
    name
  }

  private def liveGens(root: java.io.File): Set[String] =
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSet

  test("orphan newer than the flipped-from gen is swept; the genuinely previous gen is retained") {
    val root = Files.createTempDirectory("graft-genstate").toFile
    val state = root.toString
    val gA = mkGen(root, 1000L, 0L)
    GenState.flip(state, 0L, gA)
    val gB = mkGen(root, 2000L, 1L)
    GenState.flip(state, 1L, gB) // current=gB, retained previous=gA
    // crash window: gC written, flip never happened
    val gC = mkGen(root, 3000L, 2L)
    // recovery re-processes batch 2 into a fresh gen and flips
    val gD = mkGen(root, 4000L, 2L)
    GenState.flip(state, 2L, gD)
    val live = liveGens(root)
    assert(GenState.currentGen(state).contains(gD))
    assert(live.contains(gB),
      s"flipped-from gen $gB must survive as the retained previous generation " +
        s"(a reader that resolved the pointer just before the flip may still scan it); live=$live")
    assert(!live.contains(gC),
      s"orphan $gC (written, never flipped to — no reader can hold it) must be swept; live=$live")
    assert(!live.contains(gA), s"older-than-retention gen $gA must be swept; live=$live")
  }

  test("first flip sweeps crashed first-write orphans") {
    val root = Files.createTempDirectory("graft-genstate-first").toFile
    val state = root.toString
    val orphan = mkGen(root, 1000L, 0L) // written by a run that died pre-flip
    val g = mkGen(root, 2000L, 0L)
    GenState.flip(state, 0L, g)
    val live = liveGens(root)
    assert(live == Set(g), s"only the first flipped gen may remain; live=$live, orphan=$orphan")
  }
}
