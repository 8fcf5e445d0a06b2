package graft.mm

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "image", "s3://bucket/a.jpg", Array[Byte](1, 2, 3, 4), Some(640), Some(480), None),
      MediaRecord(2L, "image", "s3://bucket/b.jpg", Array.fill[Byte](100)(7), None, None, None),
      MediaRecord(3L, "video", "s3://bucket/c.mp4", Array.fill[Byte](64)(9), None, None, Some(5000L)),
      MediaRecord(4L, "audio", "s3://bucket/d.wav", Array[Byte](5), None, None, Some(1000L))
    ).toDS()
  }

  test("binary media round-trips through parquet with schema intact") {
    import spark.implicits._
    val dir = tmpDir("media")
    media.write.mode("overwrite").parquet(s"$dir/t")
    val back = Multimodal.readMedia(spark, s"$dir/t")
    assert(back.count() === 4)
    val r = back.filter(_.media_id == 1L).head()
    assert(r.content.toSeq === Seq[Byte](1, 2, 3, 4))
    assert(r.width === Some(640))
  }

  test("decodeImage: real PNG decode wins; undecodable falls back to declared metadata") {
    import spark.implicits._
    val png = Multimodal.synthesizePng(10, 5, 100)
    val mixed = Seq(
      // real PNG with WRONG declared metadata: decoded values must win
      MediaRecord(1L, "image", "mem://a.png", png, Some(999), Some(999), None),
      // garbage bytes: declared metadata fallback + -1.0 sentinel
      MediaRecord(2L, "image", "mem://b.jpg", Array.fill[Byte](100)(7), Some(640), Some(480), None),
      // non-image rows are filtered out entirely
      MediaRecord(3L, "video", "mem://c.mp4", png, None, None, Some(5000L))
    ).toDS()
    val feats = Multimodal.decodeImage(mixed).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(feats(0).width === 10 && feats(0).height === 5)
    assert(feats(0).aspect_ratio === 2.0)
    assert(feats(0).n_bytes === png.length.toLong)
    // solid gray 100 → brightness exactly 100/255 (lossless round-trip)
    assert(math.abs(feats(0).brightness - 100.0 / 255.0) < 1e-12)
    assert(feats(1).width === 640 && feats(1).height === 480)
    assert(feats(1).brightness === -1.0)
  }

  test("dhash: codec-invariant on pixels, seed-sensitive, corrupt excluded, buckets capped") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1L, "image", "mem://a.png",
        Multimodal.synthesizePatternImage(36, 32, seed = 7, "png"), None, None, None),
      MediaRecord(2L, "image", "mem://a.bmp",
        Multimodal.synthesizePatternImage(36, 32, seed = 7, "bmp"), None, None, None),
      MediaRecord(3L, "image", "mem://b.png",
        Multimodal.synthesizePatternImage(36, 32, seed = 8, "png"), None, None, None),
      MediaRecord(4L, "image", "mem://junk", Array.fill[Byte](50)(9), None, None, None)
    ).toDS()
    val hashes = Multimodal.dhashImages(ds).collect().sortBy(_.media_id)
    // same pixels through two containers → identical hash
    assert(hashes(0).dhash === hashes(1).dhash)
    assert(hashes(0).decoded && hashes(1).decoded)
    // a different scene → a different hash
    assert(hashes(2).dhash !== hashes(0).dhash)
    // corrupt payload keeps its row with the sentinel
    assert(!hashes(3).decoded && hashes(3).dhash === -1L)
    val pairs = Multimodal.imageDupPairs(Multimodal.dhashImages(ds))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // a bucket past maxBucket is one dup GROUP, not pairs: dropped
    val many = (1L to 4L).map(i => MediaRecord(i, "image", s"mem://$i",
      Multimodal.synthesizePatternImage(36, 32, seed = 7, "png"), None, None, None)).toDS()
    assert(Multimodal.imageDupPairs(Multimodal.dhashImages(many), maxBucket = 3).count() === 0L)
  }

  test("ahash: container/endianness-invariant on samples, seed-sensitive, corrupt excluded") {
    import spark.implicits._
    val ds = Seq(
      MediaRecord(1L, "audio", "mem://a.wav",
        Multimodal.synthesizePatternAudio(8000, 512, seed = 3, "wav"), None, None, None),
      MediaRecord(2L, "audio", "mem://a.aiff",
        Multimodal.synthesizePatternAudio(8000, 512, seed = 3, "aiff"), None, None, None),
      MediaRecord(3L, "audio", "mem://b.wav",
        Multimodal.synthesizePatternAudio(8000, 512, seed = 4, "wav"), None, None, None),
      MediaRecord(4L, "audio", "mem://junk", Array.fill[Byte](64)(5), None, None, None)
    ).toDS()
    val hashes = Multimodal.ahashAudio(ds).collect().sortBy(_.media_id)
    assert(hashes(0).ahash === hashes(1).ahash) // WAV vs AIFF, same PCM
    assert(hashes(0).decoded && hashes(1).decoded)
    assert(hashes(2).ahash !== hashes(0).ahash)
    assert(!hashes(3).decoded && hashes(3).ahash === -1L)
    val pairs = Multimodal.audioDupPairs(Multimodal.ahashAudio(ds))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("decodeAudio: real WAV decode; garbage falls back with -1 sentinel") {
    import spark.implicits._
    val wav = Multimodal.synthesizeWav(sampleRate = 8000, nSamples = 400, sampleValue = 16000)
    val mixed = Seq(
      MediaRecord(1L, "audio", "mem://a.wav", wav, None, None, None),
      MediaRecord(2L, "audio", "mem://b.mp3", Array.fill[Byte](64)(3), None, None, Some(777L)),
      MediaRecord(3L, "image", "mem://c.png", wav, None, None, None) // filtered out
    ).toDS()
    val feats = Multimodal.decodeAudio(mixed).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(feats(0).sample_rate === 8000 && feats(0).channels === 1)
    assert(feats(0).n_samples === 400L)
    assert(feats(0).duration_us === 400L * 1000000L / 8000L) // 50 ms
    // constant signal: RMS is exactly amplitude/32767 (to fp noise)
    assert(math.abs(feats(0).rms - 16000.0 / 32767.0) < 1e-12)
    assert(feats(1).rms === -1.0 && feats(1).duration_us === 777000L)
  }

  test("decodeFrames: real animated-GIF demux, every-th sampling, corrupt sentinel") {
    import spark.implicits._
    val gif = Multimodal.synthesizeGif(8, 6, Seq(0, 51, 102, 153, 204))
    val media = Seq(
      MediaRecord(1L, "video", "mem://g/1", gif, None, None, None),
      MediaRecord(2L, "video", "mem://g/2", Array[Byte](1, 2, 3), None, None, None),
      MediaRecord(3L, "image", "mem://p/3", gif, None, None, None) // wrong kind: excluded
    ).toDS()
    val out = Multimodal.decodeFrames(media, every = 2)
      .collect().sortBy(f => (f.media_id, f.frame_ix))
    val good = out.filter(_.media_id == 1L)
    // frames 0, 2, 4 of five; solid gray g decodes to brightness g/255
    assert(good.map(_.frame_ix).toSeq === Seq(0, 2, 4))
    assert(good.forall(f => f.width == 8 && f.height == 6))
    assert(good.map(f => math.round(f.brightness * 255).toInt).toSeq
      === Seq(0, 102, 204))
    // corrupt payload → one sentinel row, not a dropped id
    val bad = out.filter(_.media_id == 2L)
    assert(bad.map(f => (f.frame_ix, f.brightness)).toSeq === Seq((-1, -1.0)))
    assert(!out.exists(_.media_id == 3L))
  }

  test("sampleFrames expands videos only, one row per interval") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000).collect()
    assert(frames.forall(_.media_id == 3L))
    assert(frames.length === 5)
    assert(frames.map(_.ts_ms).sorted.toSeq === Seq(0L, 1000L, 2000L, 3000L, 4000L))
  }

  test("repartitionBySize yields at least one partition and preserves rows") {
    val df = media.toDF()
    val out = Multimodal.repartitionBySize(df, "content", targetMb = 1)
    assert(out.count() === 4)
    assert(out.rdd.getNumPartitions >= 1)
  }
}
