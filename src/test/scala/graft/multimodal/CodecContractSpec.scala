package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.{FakeVideoCodec, MjpegVideoCodec, VideoCodec}

/** Pins the [[Multimodal.VideoCodec]] seam contract (round-8 VERDICT
  * item 6) for BOTH shipped implementations, clause by clause, so an
  * H.264/VP9 drop-in has an executable definition of "compatible":
  * implement [[Multimodal.VideoCodec]], satisfy this spec's shared
  * clauses (1–4), prepend to [[Multimodal.DefaultVideoCodecs]]. No
  * Spark-side change. Clause 5 (content addressing) binds REAL codecs
  * only; the MJPEG section pins it, the stub is documented exempt. */
class CodecContractSpec extends AnyFunSuite {

  private def md = java.security.MessageDigest.getInstance("MD5")

  /** A minimal well-formed JPEG-shaped frame: SOI … payload … EOI.
    * (MjpegCodec scans markers; it doesn't entropy-decode.) */
  private def jpegFrame(seed: Byte): Array[Byte] =
    Array[Byte](0xFF.toByte, 0xD8.toByte, 0x01, seed, 0x02,
      0xFF.toByte, 0xD9.toByte)

  private def mjpeg(seeds: Byte*): Array[Byte] =
    seeds.toArray.flatMap(jpegFrame)

  private val garbageInputs: Seq[Array[Byte]] = Seq(
    Array.empty[Byte],
    Array[Byte](0x00),
    Array[Byte](0xFF.toByte, 0xD8.toByte), // SOI but no EOI (truncated)
    "plain text payload".getBytes("UTF-8"),
    Array.fill(64)(0xFF.toByte))

  private def sharedClauses(codec: VideoCodec, decodable: Array[Byte]): Unit = {
    // clause 1: open never throws, on decodable or garbage input
    garbageInputs.foreach(g => codec.open(g, 100L)) // must not throw
    val durationMs = 100L
    codec.open(decodable, durationMs).foreach { o =>
      // clause 4: nFrames >= 1
      assert(o.nFrames >= 1, s"${codec.name}: nFrames < 1")
      // clause 3: total on [0, duration), hex-32, edges included
      val digests = (0L until durationMs).map { ts =>
        val d = o.frameDigestAt(ts, md)
        assert(d.matches("[0-9a-f]{32}"), s"${codec.name}: non-md5-hex digest at ts=$ts")
        d
      }
      // clause 2: deterministic across instances
      val o2 = codec.open(decodable, durationMs).get
      (0L until durationMs).foreach { ts =>
        assert(o2.frameDigestAt(ts, md) == digests(ts.toInt),
          s"${codec.name}: digest not deterministic at ts=$ts")
      }
      // clause 4: monotone ts -> frame mapping — once the digest changes
      // away from a frame, that frame never recurs (no backward seeks)
      val firstSeen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      digests.zipWithIndex.foreach { case (d, i) => firstSeen.getOrElseUpdate(d, i) }
      var lastFirst = -1
      digests.distinct.foreach { d =>
        assert(firstSeen(d) > lastFirst, s"${codec.name}: frame order not monotone")
        lastFirst = firstSeen(d)
      }
    }
  }

  test("MJPEG codec satisfies shared contract clauses 1-4") {
    sharedClauses(MjpegVideoCodec, mjpeg(1, 2, 3, 4))
  }

  test("fake codec satisfies shared contract clauses 1-4") {
    sharedClauses(FakeVideoCodec, "not a real container".getBytes("UTF-8"))
  }

  test("clause 5 (real codecs): MJPEG digests are content-addressed") {
    // the same frame bytes inside DIFFERENT containers digest identically
    val shared: Byte = 9
    val a = mjpeg(1, shared, 2)
    val b = mjpeg(7, 8, shared)
    val oa = MjpegVideoCodec.open(a, 3L).get
    val ob = MjpegVideoCodec.open(b, 3L).get
    // frame idx = ts * n / duration: ts=1 -> frame 1 of a; ts=2 -> frame 2 of b
    assert(oa.frameDigestAt(1L, md) == ob.frameDigestAt(2L, md),
      "identical footage must digest identically across assets")
    // and the stub is documented NOT to: same payloads give ts-dependent digests
    val fo = FakeVideoCodec.open(a, 3L).get
    assert(fo.frameDigestAt(1L, md) != fo.frameDigestAt(2L, md))
  }

  test("chain order: MJPEG payloads open under the real codec, garbage falls to the stub") {
    val chain = Multimodal.DefaultVideoCodecs
    val real = mjpeg(5, 6)
    val text = "synthetic asset".getBytes("UTF-8")
    def winner(p: Array[Byte]): String =
      chain.iterator.flatMap(c => c.open(p, 10L).map(_ => c.name)).next()
    assert(winner(real) == "mjpeg")
    assert(winner(text) == "fake")
    // the stub is terminal: it opens anything, so the chain is total
    garbageInputs.foreach(g => assert(chain.flatMap(_.open(g, 10L)).nonEmpty))
  }
}
