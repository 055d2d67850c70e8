package graft

import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = MultimodalOps.syntheticMedia(spark, 30)

  test("decodeImageFeatures: partition-wise decode emits one feature row " +
       "per record, null blob degrades to null features") {
    val withNull = media.unionByName(
      Seq(("m_null", null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "blob")
        .withColumn("meta", lit(null).cast(MultimodalOps.MediaMeta)))
    val feats = MultimodalOps.decodeImageFeatures(withNull).collect()
    assert(feats.length === 31)
    val ok = feats.filter(_.getString(0) != "m_null")
    assert(ok.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 8))
    assert(ok.forall(r => r.getInt(3) === 3))
    val nullRow = feats.find(_.getString(0) == "m_null").get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(4))
    // determinism: same blob → same features on rerun
    val again = MultimodalOps.decodeImageFeatures(withNull).collect()
    assert(feats.map(_.toString).sorted === again.map(_.toString).sorted)
  }

  test("resizeImageFeatures: nearest-neighbor resample matches a direct " +
       "reference computation; null blob degrades; identity-size resize " +
       "preserves luma") {
    val withNull = media.unionByName(
      Seq(("m_null", null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "blob")
        .withColumn("meta", lit(null).cast(MultimodalOps.MediaMeta)))
    val out = MultimodalOps.resizeImageFeatures(withNull, 4, 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("m_null").isNullAt(4))
    // reference recompute in plain Scala against the decoded pixels
    val blobs = media.select("media_id", "blob").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    blobs.foreach { case (id, blob) =>
      val d = MultimodalOps.DecodeStub.decodeImage(blob)
      var sum = 0L
      for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
        val sx = x * d.width / 4; val sy = y * d.height / 4
        sum += math.round(d.pixels((sy * d.width + sx) * 3 + c) * 255f)
      }
      val expect = (1000L * sum) / (255L * 48)
      assert(out(id).getLong(4) === expect, s"resize luma mismatch for $id")
      assert(out(id).getInt(1) === 4 && out(id).getInt(2) === 4)
    }
    // identity resize: a wxh image resized to (w,h) keeps its luma
    val one = media.limit(1).collect().head
    val d = MultimodalOps.DecodeStub.decodeImage(one.getAs[Array[Byte]]("blob"))
    val idLuma = MultimodalOps.resizeImageFeatures(
      media.limit(1), d.width, d.height).collect().head.getLong(4)
    val decLuma = MultimodalOps.decodeImageFeatures(
      media.limit(1)).collect().head.getLong(4)
    assert(idLuma === decLuma)
  }

  test("sampleFrameOffsets: evenly spaced deterministic offsets, " +
       "videos only") {
    val frames = MultimodalOps.sampleFrameOffsets(media, 4)
    val byId = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"),
      sort_array(collect_list("frame_offset_ms")).as("offs"))
      .collect()
    assert(byId.nonEmpty)
    byId.foreach { r =>
      assert(r.getLong(1) === 4)
      val offs = r.getSeq[Long](2)
      assert(offs.head === 0L)
      assert(offs === offs.sorted)
    }
    // only video rows produce frames
    val videoIds = media.filter($"meta.media_type" === "video")
      .select("media_id").as[String].collect().toSet
    assert(byId.map(_.getString(0)).toSet === videoIds)
  }

  test("decodeAudioFeatures: deterministic features, null blob -> null " +
       "features, rerun identical") {
    val feats = MultimodalOps.decodeAudioFeatures(media)
      .orderBy("media_id").collect()
    assert(feats.length === media.count())
    feats.foreach { r =>
      assert(r.getInt(1) >= 8000 && r.getInt(1) <= 16000)
      assert(r.getInt(2) > 0)
      assert(r.getLong(3) >= 0)
    }
    val rerun = MultimodalOps.decodeAudioFeatures(media)
      .orderBy("media_id").collect()
    assert(rerun.map(_.toString).toSeq === feats.map(_.toString).toSeq)
  }

  test("real PNG codec: encode→decode round trip recovers the exact " +
       "pixel bytes (lossless), dims from the container") {
    import graft.ops.MediaCodecs
    for (i <- 0 until 20) {
      val w = 1 + i % 8; val h = 1 + (i * 7) % 8
      val pixel = (p: Int) => (i * 31 + p * 7) % 256
      val blob = MediaCodecs.encodePng(w, h, pixel)
      assert(MediaCodecs.isPng(blob))
      val d = MediaCodecs.decodeImage(blob)
      assert(d.width === w && d.height === h && d.nChannels === 3)
      for (p <- 0 until w * h * 3)
        assert(math.round(d.pixels(p) * 255f) === pixel(p),
          s"pixel $p of image $i ($w x $h)")
    }
    // DecodeStub dispatches PNG blobs to the real codec
    val blob = MediaCodecs.encodePng(3, 2, p => p * 11 % 256)
    val viaStub = MultimodalOps.DecodeStub.decodeImage(blob)
    assert(viaStub.width === 3 && viaStub.height === 2)
  }

  test("real WAV codec: PCM16 encode→decode round trip is sample-exact, " +
       "decodeAudioEnergy computes Σs² over real decode") {
    import graft.ops.MediaCodecs
    val samples = Array.tabulate[Short](200)(t => ((t * 131) % 2048 - 1024).toShort)
    val blob = MediaCodecs.encodeWavPcm16(12000, samples)
    assert(MediaCodecs.isWav(blob))
    val d = MediaCodecs.decodeWavPcm16(blob)
    assert(d.sampleRate === 12000)
    assert(d.samples.toSeq === samples.toSeq)
    // AudioDecodeStub dispatches WAV to the real codec (float contract)
    val viaStub = MultimodalOps.AudioDecodeStub.decodeAudio(blob)
    assert(viaStub.sampleRate === 12000 && viaStub.nSamples === 200)
    assert(math.round(viaStub.samples(7) * 32768f) === samples(7).toInt)
    // energy op over a real WAV table
    val wavs = MultimodalOps.syntheticWavMedia(spark, 10)
    val en = MultimodalOps.decodeAudioEnergy(wavs).orderBy("media_id").collect()
    assert(en.length === 10)
    en.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) > 0)
      assert(r.getInt(2) >= 64 && r.getInt(2) < 128)
    }
    // non-WAV blob → nulls (no stub leakage into the exact-energy path)
    val junk = Seq(("x", Array[Byte](1, 2, 3))).toDF("media_id", "blob")
    val jr = MultimodalOps.decodeAudioEnergy(junk).collect().head
    assert(jr.isNullAt(1) && jr.isNullAt(3))
  }

  test("imageAHash: identical images hash identically, a light edit " +
       "stays within a few hamming bits, unrelated images differ, " +
       "null blob -> null hash") {
    import graft.ops.MediaCodecs
    def gradient(p: Int): Int = (p / 3) % 256          // smooth ramp
    def edited(p: Int): Int =                          // one corner nudged
      if (p < 6) math.min(255, gradient(p) + 12) else gradient(p)
    def noise(p: Int): Int = (p * 137 + 41) % 256      // unrelated texture
    val rows = Seq(
      ("a", MediaCodecs.encodePng(16, 16, gradient)),
      ("a_copy", MediaCodecs.encodePng(16, 16, gradient)),
      ("a_edit", MediaCodecs.encodePng(16, 16, edited)),
      ("other", MediaCodecs.encodePng(16, 16, noise)),
      ("broken", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "blob")
    val got = MultimodalOps.imageAHash(rows).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(got("a") === got("a_copy"), "identical bytes must collide")
    assert(got("broken") === None)
    def hamming(x: (Long, Long), y: (Long, Long)): Int =
      java.lang.Long.bitCount(x._1 ^ y._1) +
        java.lang.Long.bitCount(x._2 ^ y._2)
    val near = hamming(got("a").get, got("a_edit").get)
    val far = hamming(got("a").get, got("other").get)
    assert(near <= 8, s"light edit moved $near bits")
    assert(far > near, s"unrelated image ($far bits) must differ more " +
      s"than the edit ($near bits)")
  }

  test("audioFingerprint: identical clips collide, a lightly scaled " +
       "copy keeps most delta signs, non-WAV and short clips degrade") {
    import graft.ops.MediaCodecs
    def tone(t: Int): Short = (((t * 37) % 1200) - 600).toShort
    val base = Array.tabulate[Short](256)(tone)
    // 10% quieter copy: energies scale ~uniformly, delta SIGNS survive
    val scaled = base.map(s => (s * 9 / 10).toShort)
    val rows = Seq(
      ("a", MediaCodecs.encodeWavPcm16(8000, base)),
      ("a_copy", MediaCodecs.encodeWavPcm16(8000, base)),
      ("a_quiet", MediaCodecs.encodeWavPcm16(8000, scaled)),
      ("tiny", MediaCodecs.encodeWavPcm16(8000, base.take(20))),
      ("not_wav", Array[Byte](1, 2, 3)),
      ("broken", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "blob")
    val got = MultimodalOps.audioFingerprint(rows, windowSamples = 16)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some((r.getInt(1), r.getLong(2)))))
      .toMap
    assert(got("a") === got("a_copy"), "identical clips must collide")
    assert(got("broken") === None && got("not_wav") === None)
    assert(got("tiny") === Some((1, 0L)), "sub-2-window clip → fp 0")
    val (nw, fpA) = got("a").get
    assert(nw === 16)
    val fpQ = got("a_quiet").get._2
    val moved = java.lang.Long.bitCount(fpA ^ fpQ)
    assert(moved <= 4, s"light volume change moved $moved delta signs")
  }

  test("metadata filters prune the blob column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val filtered = MultimodalOps.filterByResolution(
      spark.read.parquet(dir), 1, 8).select("media_id", "meta")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("blob"),
      s"blob must be pruned from the scan:\n$plan")
    assert(filtered.count() === 10) // the image third of 30
  }
}
