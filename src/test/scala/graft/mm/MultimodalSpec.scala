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

  test("decodeImage: images only, declared metadata wins, stub features deterministic") {
    val feats = Multimodal.decodeImage(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(feats(0).width === 640 && feats(0).height === 480)
    assert(feats(0).aspect_ratio === 640.0 / 480)
    assert(feats(0).n_bytes === 4)
    // stub decode is deterministic
    val again = Multimodal.decodeImage(media).collect().sortBy(_.media_id)
    assert(feats.map(_.brightness).toSeq === again.map(_.brightness).toSeq)
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
