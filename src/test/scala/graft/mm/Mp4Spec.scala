package graft.mm

import graft.SparkSpec

class Mp4Spec extends SparkSpec {

  test("mux → demux round-trips timestamps, sizes, dims, and sample bytes") {
    val durations = Seq(10, 20, 30)
    val samples = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val bytes = Mp4.mux(320, 240, timescale = 1000, durations, samples)
    val frames = Mp4.demux(7L, bytes)
    assert(frames.map(_.frame_ix) === Seq(0, 1, 2))
    assert(frames.map(_.ts_ms) === Seq(0L, 10L, 30L)) // prefix sums of durations
    assert(frames.forall(f => f.width == 320 && f.height == 240))
    assert(frames.map(_.sample_size) === Seq(3L, 1L, 2L))
    assert(frames.map(_.sample.toSeq) === samples.map(_.toSeq))
  }

  test("timescale scales presentation times to milliseconds") {
    val bytes = Mp4.mux(16, 16, timescale = 90000, Seq(90000, 45000),
      Seq(Array[Byte](1), Array[Byte](2)))
    assert(Mp4.demux(1L, bytes).map(_.ts_ms) === Seq(0L, 1000L))
  }

  test("the written fixture is a real ISO BMFF file (box sizes tile exactly)") {
    val bytes = Mp4.mux(32, 24, timescale = 600, Seq(1, 2, 3),
      Seq(Array[Byte](1), Array[Byte](2), Array[Byte](3)))
    // walk top-level boxes by declared size: must tile the file exactly
    // with the mandatory ftyp/moov/mdat sequence
    var p = 0
    val types = Seq.newBuilder[String]
    while (p < bytes.length) {
      val size = java.nio.ByteBuffer.wrap(bytes, p, 4).getInt
      types += new String(bytes, p + 4, 4, "US-ASCII")
      assert(size >= 8 && p + size <= bytes.length)
      p += size
    }
    assert(p === bytes.length)
    assert(types.result() === Seq("ftyp", "moov", "mdat"))
  }

  test("corrupt / non-video payloads yield the sentinel row, images are skipped") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, "video", "mem://x", Array[Byte](1, 2, 3, 4, 5), None, None, None),
      MediaRecord(2L, "image", "mem://y", Array[Byte](9), None, None, None)).toDS()
    val out = Mp4.demuxFrames(media).collect()
    assert(out.length === 1)
    assert(out(0).media_id === 1L && out(0).frame_ix === -1)
  }

  test("adversarial box counts are clamped by payload length, not materialized") {
    // corrupt the stsz sample count to ~2^31: an unclamped demux would
    // drive a 2-billion-element Seq.fill (OutOfMemoryError — which
    // NonFatal does NOT catch) instead of degrading gracefully
    val bytes = Mp4.mux(16, 16, timescale = 1000, Seq(10, 10),
      Seq(Array[Byte](1, 2), Array[Byte](3, 4)))
    def findBox(tpe: String): Int = {
      val pat = tpe.getBytes("US-ASCII")
      (0 until bytes.length - 4).find(i => pat.indices.forall(j => bytes(i + j) == pat(j))).get
    }
    // stsz layout: [size][stsz][verflags][default_size][count]
    val countOff = findBox("stsz") + 4 + 4 + 4
    val corrupted = bytes.clone()
    java.nio.ByteBuffer.wrap(corrupted, countOff, 4).putInt(Int.MaxValue)
    val frames = Mp4.demux(5L, corrupted) // must return, not OOM
    // default_size == 0 here, so count clamps to the per-sample entry
    // bytes actually present (2 entries) — the real samples survive
    assert(frames.length <= 2)
    // same corruption on stts entry count
    val sttsOff = findBox("stts") + 4 + 4
    val corrupted2 = bytes.clone()
    java.nio.ByteBuffer.wrap(corrupted2, sttsOff, 4).putInt(Int.MaxValue)
    assert(Mp4.demux(6L, corrupted2).length <= 2)
  }

  test("truncated mdat degrades to empty sample bytes, not a crash") {
    val full = Mp4.mux(8, 8, timescale = 1000, Seq(10, 10),
      Seq(Array.fill(40)(1.toByte), Array.fill(40)(2.toByte)))
    val frames = Mp4.demux(3L, full.take(full.length - 50))
    assert(frames.nonEmpty)
    assert(frames.forall(f => f.sample.length == f.sample_size || f.sample.isEmpty))
  }
}
