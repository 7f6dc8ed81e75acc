package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-JVM codecs: encode→decode must
  * round-trip header facts and pixel/sample means for ARBITRARY
  * dimensions and byte patterns, not just the synthesis formulas the
  * fixtures use (fixed seeds — same offline raw-ScalaCheck pattern as
  * OpsProperties). No Spark session needed.
  */
class MediaCodecsProperties extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i =>
      g(Gen.Parameters.default.withSize(20), Seed(seed + i)))

  test("BMP round-trips width/height/mean for arbitrary dims and patterns") {
    val cases = sample(Gen.zip(
      Gen.choose(1, 40), Gen.choose(1, 25), Gen.choose(0L, 255L),
      Gen.choose(1L, 97L)), 40, 11L)
    cases.foreach { case (w, h, off, mult) =>
      def pix(k: Long): Int = ((k * mult + off) % 256).toInt
      val d = MediaCodecs.decode(MediaCodecs.encodeBmp(w, h, pix))
      assert(d.format == "bmp" && d.width == w && d.height == h, s"($w,$h)")
      val n = 3L * w * h
      val expected = (0L until n).map(k => pix(k).toDouble).sum / n
      assert(math.abs(d.meanVal - expected) < 1e-12,
        s"($w,$h,$off,$mult): ${d.meanVal} vs $expected")
    }
  }

  test("PPM round-trips for arbitrary dims incl. multi-digit headers") {
    val cases = sample(Gen.zip(
      Gen.choose(1, 120), Gen.choose(1, 15), Gen.choose(0L, 255L)), 30, 23L)
    cases.foreach { case (w, h, off) =>
      def pix(k: Long): Int = ((k * 7 + off) % 251).toInt
      val d = MediaCodecs.decode(MediaCodecs.encodePpm(w, h, pix))
      assert(d.format == "ppm" && d.width == w && d.height == h, s"($w,$h)")
      val n = 3L * w * h
      val expected = (0L until n).map(k => pix(k).toDouble).sum / n
      assert(math.abs(d.meanVal - expected) < 1e-12, s"($w,$h,$off)")
    }
  }

  test("WAV round-trips channels/rate/frames/mean for arbitrary PCM") {
    val cases = sample(Gen.zip(
      Gen.choose(1, 4), Gen.choose(1000, 48000), Gen.choose(0L, 300L),
      Gen.choose(-900L, 900L)), 40, 37L)
    cases.foreach { case (ch, rate, frames, off) =>
      def smp(k: Long): Int = ((k * 13 + off) % 1201 - 600).toInt
      val d = MediaCodecs.decode(MediaCodecs.encodeWav(ch, rate, frames, smp))
      assert(d.format == "wav" && d.channels == ch && d.sampleRate == rate)
      assert(d.nFrames == frames, s"($ch,$rate,$frames)")
      val n = ch * frames
      if (n > 0) {
        val expected = (0L until n).map(k => smp(k).toDouble).sum / n
        assert(math.abs(d.meanVal - expected) < 1e-12, s"($ch,$rate,$frames,$off)")
      } else assert(d.meanVal == 0.0)
    }
  }

  test("mutating any single header byte never hangs: decode rejects or returns") {
    // liveness property for the chunk walk / header parses: corrupting
    // one byte may still decode (e.g. a payload byte) or must throw —
    // but always terminates. Covers the negative-chunk-size class.
    val payloads = Seq(
      MediaCodecs.encodeBmp(5, 3, k => (k % 256).toInt),
      MediaCodecs.encodePpm(5, 3, k => (k % 256).toInt),
      MediaCodecs.encodeWav(2, 8000, 10, k => (k % 100).toInt))
    val muts = sample(Gen.zip(Gen.choose(0, 53), Gen.choose(0, 255)), 60, 53L)
    payloads.foreach { orig =>
      muts.foreach { case (pos, v) =>
        if (pos < orig.length) {
          val b = orig.clone()
          b(pos) = v.toByte
          try MediaCodecs.decode(b)
          catch {
            case _: IllegalArgumentException => ()
            case _: ArrayIndexOutOfBoundsException =>
              fail(s"AIOOBE instead of rejection at byte $pos := $v")
          }
        }
      }
    }
  }
}
