package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Bmp, Frames, Wav}
import org.scalatest.funsuite.AnyFunSuite

/** The decode kernels are real pure-JVM codecs — these specs decode
  * hand-constructed payloads and assert exact feature values. */
class MultimodalSpec extends AnyFunSuite {

  test("WAV round-trip: PCM-16 mono samples and rate survive encode/decode") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val (rate, back) = Wav.decode(Wav.encode(22050, samples))
    assert(rate === 22050)
    assert(back.toSeq === samples.toSeq)
  }

  test("WAV decode skips unknown RIFF chunks between fmt and data") {
    val base = Wav.encode(8000, Array[Short](1, 2, 3))
    // splice a 6-byte LIST chunk (word-aligned) before the data chunk
    val dataAt = base.indexOfSlice("data".getBytes)
    val junk = "LIST".getBytes ++ Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(dataAt) ++ junk ++ base.drop(dataAt)
    assert(Wav.decode(spliced)._2.toSeq === Seq[Short](1, 2, 3))
  }

  test("WAV features: alternating-sign square wave has exact stats") {
    val samples = Array[Short](100, -100, 100, -100)
    val f = Wav.features(Wav.encode(16000, samples))
    assert(f(0) === 16000 / 48000f)          // rate
    assert(f(1) === 4 / 65536f)              // n samples
    assert(f(2) === 0f)                      // mean
    assert(f(3) === 100f / 32768f)           // rms of constant magnitude
    assert(f(4) === 100f / 32768f)           // peak
    assert(f(5) === 1f)                      // every step crosses zero
    assert(f(6) === 0.5f)                    // energy evenly split
    assert(f(7) === 4f / 16000f)             // duration
  }

  test("BMP round-trip: 3x2 pixels survive encode/decode in row-major order") {
    val pix = Map((0, 0) -> (255, 0, 0), (1, 0) -> (0, 255, 0), (2, 0) -> (0, 0, 255),
      (0, 1) -> (10, 20, 30), (1, 1) -> (40, 50, 60), (2, 1) -> (70, 80, 90))
    val (w, h, px) = Bmp.decode(Bmp.encode(3, 2, (x, y) => pix((x, y))))
    assert((w, h) === ((3, 2)))
    assert(px.toSeq === Seq(0xff0000, 0x00ff00, 0x0000ff, 0x0a141e, 0x28323c, 0x46505a))
  }

  test("BMP features: uniform image has exact channel means, zero gradient") {
    val f = Bmp.features(Bmp.encode(4, 4, (_, _) => (200, 100, 50)))
    assert(f(0) === 4 / 1024f)
    assert(f(1) === 4 / 1024f)
    assert(f(2) === (200.0 / 255.0).toFloat)
    assert(f(3) === (100.0 / 255.0).toFloat)
    assert(f(4) === (50.0 / 255.0).toFloat)
    val lum = (200 * 299 + 100 * 587 + 50 * 114) / 1000 // = 124
    assert(f(5) === (lum / 255.0).toFloat)
    assert(f(6) === 0f)  // uniform -> no gradient
    assert(f(7) === 0f)  // lum 124 is not > 127
  }

  test("BMP resize: nearest-neighbor 2x up and down keeps exact pixels") {
    val src = Bmp.encode(2, 2, (x, y) => (x * 100, y * 100, 50))
    val (w, h, up) = Bmp.decode(Bmp.resize(src, 4, 4))
    assert((w, h) === ((4, 4)))
    // each source pixel becomes a 2x2 block
    assert(up.toSeq === Seq(
      0x000032, 0x000032, 0x640032, 0x640032,
      0x000032, 0x000032, 0x640032, 0x640032,
      0x006432, 0x006432, 0x646432, 0x646432,
      0x006432, 0x006432, 0x646432, 0x646432))
    // downscale back picks the top-left of each block -> original image
    assert(Bmp.decode(Bmp.resize(Bmp.resize(src, 4, 4), 2, 2))._3.toSeq
      === Bmp.decode(src)._3.toSeq)
  }

  test("video frame split + sampling: identical frames average to the frame features") {
    val frame = Bmp.encode(5, 3, (x, y) => (x * 40, y * 80, 128))
    val stream = frame ++ frame ++ frame ++ frame
    assert(Frames.split(stream).size === 4)
    // sampleEvery=2 decodes frames 0 and 2 — identical, so avg == single
    assert(Frames.features(stream, 2).toSeq === Bmp.features(frame).toSeq)
  }

  test("decodeBatch dispatches per modality and rejects unknown tags") {
    val wav = Wav.encode(8000, Array[Short](5, -5))
    val bmp = Bmp.encode(2, 2, (x, y) => (x, y, 0))
    val out = Multimodal.decodeBatch(Seq(
      Multimodal.Asset(1, "audio", wav), Multimodal.Asset(2, "image", bmp)))
    assert(out.map(_.asset_id) === Seq(1L, 2L))
    assert(out.forall(_.feature.length === Multimodal.featureDim))
    assert(out.head.n_bytes === wav.length)
    intercept[IllegalArgumentException] {
      Multimodal.decodeBatch(Seq(Multimodal.Asset(3, "hologram", wav)))
    }
  }

  test("synthetic assets carry decodable payloads for all modalities") {
    val spark = TestSpark.spark
    val feats = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 30))
    assert(feats.count() === 30)
    // every modality present and every feature finite
    val rows = feats.collect()
    assert(rows.map(_.getString(1)).toSet === Set("image", "audio", "video"))
    assert(rows.forall(_.getSeq[Float](3).forall(v => !v.isNaN && !v.isInfinite)))
  }
}
