package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Decode, MediaRef}

class TextMultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("text_stats invariants: distinct <= words, avg len positive") {
    val df = SparkEntry.queries("text_stats")(spark, sf)
    assert(df.filter(col("n_distinct_words") > col("n_words")).count() === 0)
    assert(df.filter(col("avg_word_len") <= 0).count() === 0)
  }

  test("character entropy: zero for constant docs, ~ln(k) for uniform") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),          // one class: entropy exactly 0
      (2L, "abcd"),          // uniform over 4: ln(4) = 1.386294 nats
      (3L, "aabb")           // uniform over 2: ln(2) = 0.693147 nats
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((4L, 1L, 0L)))
    // FLOOR quantization loses < 1 micro-nat per char class
    assert(out(2L)._3 > 1386290L && out(2L)._3 <= 1386294L)
    assert(out(3L)._3 > 693145L && out(3L)._3 <= 693147L)
    assert(out(2L)._2 === 4L && out(3L)._2 === 2L)
    // corpus sanity: natural-language docs sit well above constant-run
    // entropy and below the uniform-byte ceiling
    val corpus = SparkEntry.queries("text_entropy")(spark, sf).collect()
    assert(corpus.length === Tables.documents(spark, sf).count())
    assert(corpus.forall(r => r.getLong(3) > 1000000L && r.getLong(3) < 5000000L))
  }

  test("lm score: every doc scores negative with one bigram per word pair") {
    val lm = SparkEntry.queries("text_lm_score")(spark, sf)
    assert(lm.filter(col("avg_logp_x1e6") >= 0).count() === 0,
      "smoothed log-probs are strictly negative")
    // n_bigrams = n_words - 1 for every doc (all test docs have >= 2 words)
    val stats = SparkEntry.queries("text_stats")(spark, sf).select("doc_id", "n_words")
    val bad = lm.join(stats, "doc_id")
      .filter(col("n_bigrams") =!= col("n_words") - 1)
    assert(bad.count() === 0)
    // a repeated high-frequency bigram scores better than rare text:
    // the most common corpus bigram appears in many docs, so docs made
    // mostly of frequent pairs sit above the corpus median score
    assert(lm.count() === Tables.documents(spark, sf).count())
  }

  test("modality router detects injected container headers") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val payloads = Seq(
      (1L, b(0xFF, 0xD8, 0xFF, 0xE0) ++ "JFIF".getBytes),
      (2L, b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)),
      (3L, "GIF87a trailer".getBytes),
      (4L, "RIFF".getBytes ++ b(36, 0, 0, 0) ++ "WAVEfmt ".getBytes),
      (5L, b(0, 0, 0, 24) ++ "ftypmp42".getBytes),
      (6L, "plain old text".getBytes)
    ).toDF("doc_id", "payload")
    val got = Multimodal.routeModality(payloads)
      .select("doc_id", "modality").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "image/jpeg", 2L -> "image/png", 3L -> "image/gif",
      4L -> "audio/wav", 5L -> "video/mp4", 6L -> "application/octet-stream"))
  }

  test("bm25 ranks term-bearing docs, descending, tie-broken by doc_id") {
    val df = SparkEntry.queries("text_bm25")(spark, sf)
    val rows = df.collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0), "every returned doc must match >= 1 query term")
    assert(scores.sameElements(scores.sortBy(-_)), "scores must be descending")
    // every returned doc really contains one of the query terms
    val ids = rows.map(_.getLong(0))
    val withTerm = Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ids: _*))
      .filter(array_contains(split(col("text"), " "), "table") ||
        array_contains(split(col("text"), " "), "hash") ||
        array_contains(split(col("text"), " "), "merge"))
    assert(withTerm.count() === 10)
  }

  test("tfidf similarity: 3 query docs, descending top-5, cosine-bounded, no self") {
    val df = SparkEntry.queries("text_tfidf_sim")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.length).toSeq, s"q=$q ranks")
      val sims = byRank.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"q=$q descending")
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001), s"q=$q cosine bound")
      assert(!rs.exists(_.getLong(2) == q), s"q=$q must exclude itself")
    }
  }

  test("langid prediction equals the argmax of its scores") {
    val df = SparkEntry.queries("text_langid")(spark, sf)
    val bad = df.filter(
      greatest(col("score_de"), col("score_en"), col("score_es"), col("score_fr"), col("score_zh")) =!=
        when(col("pred_lang") === "de", col("score_de"))
          .when(col("pred_lang") === "en", col("score_en"))
          .when(col("pred_lang") === "es", col("score_es"))
          .when(col("pred_lang") === "fr", col("score_fr"))
          .when(col("pred_lang") === "zh", col("score_zh")))
    assert(bad.count() === 0)
  }

  test("corpus quality report: volumes, mean quality, and label disagreement per cell") {
    import spark.implicits._
    // two (source, lang) cells; doc 3 is labeled 'de' but its text is
    // marker-English -> exactly one mismatch in cell (sB, de)
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog", "en", "sA", 34L),
      (2L, "a boat of the sea and to shore went", "en", "sA", 35L),
      (3L, "the quick brown fox and the lazy dog", "de", "sB", 36L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.text.TextAnalysis.qualityReport(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.keySet === Set(("sA", "en"), ("sB", "de")))
    val (nA, tokA, chA, qA, mmA) = rows(("sA", "en"))
    assert(nA === 2L && tokA === 18L && chA === 69L && mmA === 0L)
    assert(qA > 0L && qA <= 10000L)
    val (nB, tokB, _, _, mmB) = rows(("sB", "de"))
    assert(nB === 1L && tokB === 8L && mmB === 1L,
      "the marker-English doc labeled 'de' must count as a mismatch")
  }

  test("quality score stays in [0, 10000] basis points") {
    val df = SparkEntry.queries("text_quality")(spark, sf)
    assert(df.filter(col("quality_bp") < 0 || col("quality_bp") > 10000).count() === 0)
  }

  test("real decode reads genuine PNG/GIF/BMP/WAV headers, stub-falls-back on opaque bytes") {
    import spark.implicits._
    def png(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    def wav(channels: Int, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = ((i * 37) % 251 - 125).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val pngBytes = png(37, 11, "png")
    val media = Seq(
      MediaRef(1L, "image/png", pngBytes),
      MediaRef(2L, "image/gif", png(5, 9, "gif")),
      MediaRef(3L, "image/bmp", png(16, 4, "bmp")),
      MediaRef(4L, "audio/wav", wav(channels = 2, frames = 480)),
      MediaRef(5L, "application/octet-stream",
        "just some opaque text bytes".getBytes("UTF-8")),
      // a payload that CLAIMS to be PNG (magic intact) but is cut off
      // before the header chunk — the damaged-object path must fall
      // back, not fail the task
      MediaRef(6L, "image/png", pngBytes.take(12)))
    val got = Decode.featuresDetected(media.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got(1L).modality === "image" && got(1L).decoded)
    assert((got(1L).width, got(1L).height, got(1L).n_frames) === ((37, 11, 1L)))
    assert((got(2L).width, got(2L).height) === ((5, 9)) && got(2L).decoded)
    assert((got(3L).width, got(3L).height) === ((16, 4)) && got(3L).decoded)
    assert(got(4L).modality === "audio" && got(4L).decoded)
    assert((got(4L).width, got(4L).height, got(4L).n_frames) === ((2, 16, 480L)))
    for (id <- Seq(5L, 6L)) {
      val f = got(id)
      assert(f.modality === "opaque" && !f.decoded, s"doc $id must fall back")
      val (sw, sh) = Decode.decodeStub(media.find(_.doc_id == id).get.payload)
      assert((f.width, f.height) === ((sw, sh)),
        s"doc $id fallback must carry the stub geometry")
    }
    // digests are payload MD5s regardless of path
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(got(1L).digest ===
      md.digest(pngBytes).map("%02x".format(_)).mkString)
  }

  test("mp4 header parse: ISO-BMFF box walk reads dims + frames, damaged boxes fall to stub") {
    import spark.implicits._
    // a minimal in-test MP4: ftyp, then moov[ trak(audio: 0x0 tkhd),
    //                                         trak(video: tkhd + stts) ]
    def box(ty: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(ty.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    def fullBoxPayload(version: Int, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + body.length)
      bb.putInt(version << 24).put(body)
      bb.array()
    }
    def tkhd(version: Int, w: Int, h: Int): Array[Byte] = {
      // v0: times/duration u32 (20B), v1: u64s (32B); then 16B of
      // layer/volume reserveds, 36B matrix, 16.16 width + height
      val pre = if (version == 1) 32 else 20
      val bb = java.nio.ByteBuffer.allocate(pre + 16 + 36 + 8)
      bb.position(pre + 16 + 36)
      bb.putInt(w << 16).putInt(h << 16)
      box("tkhd", fullBoxPayload(version, bb.array()))
    }
    def stts(counts: Seq[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + counts.size * 8)
      bb.putInt(counts.size)
      counts.foreach(c => bb.putInt(c.toInt).putInt(1000))
      box("stts", fullBoxPayload(0, bb.array()))
    }
    def cat(bs: Array[Byte]*): Array[Byte] = bs.flatten.toArray
    val ftyp = box("ftyp", "isom0000isomavc1".getBytes("ISO-8859-1"))
    def mp4(version: Int): Array[Byte] = cat(ftyp, box("moov", cat(
      box("trak", tkhd(0, 0, 0)),                     // audio track: 0x0
      box("trak", cat(tkhd(version, 640, 360),
        box("mdia", box("minf", box("stbl", stts(Seq(90L, 30L))))))))))
    for (v <- Seq(0, 1)) {
      assert(Decode.mp4Meta(mp4(v)) === Some(("video", 640, 360, 120L)),
        s"tkhd v$v must parse dims from the video track and frames from stts")
    }
    // end-to-end through the detected-features tier
    val got = Decode.featuresDetected(Seq(
        MediaRef(1L, "video/mp4", mp4(0)),
        // damaged: moov's declared size runs past the buffer
        MediaRef(2L, "video/mp4", mp4(0).dropRight(24)),
        // no ftyp brand: framing-shaped random bytes must not claim video
        MediaRef(3L, "application/octet-stream",
          cat(box("abcd", Array.fill[Byte](16)(7)))))
      .toDS()).collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).modality === "video" && got(1L).decoded)
    assert((got(1L).width, got(1L).height, got(1L).n_frames) === ((640, 360, 120L)))
    for (id <- Seq(2L, 3L))
      assert(got(id).modality === "opaque" && !got(id).decoded,
        s"doc $id must route to the stub, not half-parse")
  }

  test("ebml header parse: MKV/WebM walk reads dims + per-track frames, damage falls to stub") {
    import spark.implicits._
    // minimal in-test WebM built from raw EBML framing
    def idBytes(id: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8)
      (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
    }
    def sizeBytes(n: Int): Array[Byte] =
      if (n < 0x7f) Array((0x80 | n).toByte)
      else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeBytes(payload.length) ++ payload
    def u(v: Long): Array[Byte] = idBytes(v) // minimal big-endian uint
    def cat(bs: Array[Byte]*): Array[Byte] = bs.flatten.toArray
    val header = el(0x1A45DFA3L, el(0x4282L, "webm".getBytes("ISO-8859-1")))
    val trackVideo = el(0xAEL, cat(el(0xD7L, u(1)), el(0x83L, u(1)),
      el(0xE0L, cat(el(0xB0L, u(320)), el(0xBAL, u(240))))))
    val trackAudio = el(0xAEL, cat(el(0xD7L, u(2)), el(0x83L, u(2)),
      el(0xE1L, cat(el(0x9FL, u(2)), el(0x6264L, u(16))))))
    // a block's payload leads with its track number as an EBML varint
    def blockBytes(track: Int): Array[Byte] =
      cat(sizeBytes(track), Array[Byte](0, 0, 0), Array.fill[Byte](4)(9))
    def sb(track: Int): Array[Byte] = el(0xA3L, blockBytes(track))
    def bg(track: Int): Array[Byte] = el(0xA0L, el(0xA1L, blockBytes(track)))
    val cluster1 = el(0x1F43B675L, cat(el(0xE7L, u(0)), sb(1), sb(2), bg(1)))
    val cluster2 = el(0x1F43B675L, cat(el(0xE7L, u(1)), sb(1), sb(2)))
    val webm = cat(header,
      el(0x18538067L, cat(el(0x1654AE6BL, cat(trackVideo, trackAudio)),
        cluster1, cluster2)))
    // video track 1 has 3 blocks (2 SimpleBlocks + 1 BlockGroup Block);
    // track 2's blocks must not count
    assert(Decode.ebmlMeta(webm) === Some(("video", 320, 240, 3L)))
    // unknown-size segment (live capture): 0xFF size extends to buffer end
    val segBody = cat(el(0x1654AE6BL, trackVideo), cluster1)
    val unknownSeg = cat(header, idBytes(0x18538067L), Array(0xff.toByte), segBody)
    assert(Decode.ebmlMeta(unknownSeg) === Some(("video", 320, 240, 2L)),
      "an unknown-size segment must extend to the container end")
    // audio-only matroska: channels + bit depth through the int contract
    val audioOnly = cat(header,
      el(0x18538067L, el(0x1654AE6BL, trackAudio)))
    assert(Decode.ebmlMeta(audioOnly) === Some(("audio", 2, 16, 0L)))
    // damage and non-EBML bytes fall to None (stub routing)
    assert(Decode.ebmlMeta(webm.take(10)) === None)
    assert(Decode.ebmlMeta("not an ebml stream at all".getBytes("UTF-8")) === None)
    // end-to-end through the detected-features tier
    val got = Decode.featuresDetected(Seq(
        MediaRef(1L, "video/webm", webm),
        MediaRef(2L, "video/webm", webm.take(10)))
      .toDS()).collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).modality === "video" && got(1L).decoded)
    assert((got(1L).width, got(1L).height, got(1L).n_frames) === ((320, 240, 3L)))
    assert(got(2L).modality === "opaque" && !got(2L).decoded,
      "a truncated webm must route to the stub, not half-parse")
  }

  test("pixel tier: resize downscales aspect-preserving, audio stats read real PCM") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, x * 31 + y)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      MediaRef(1L, "image/png", png(120, 48)),  // downscale: max dim 120 -> 32
      MediaRef(2L, "image/png", png(10, 7)),    // within bound: re-encode only
      MediaRef(3L, "application/octet-stream", "not an image".getBytes("UTF-8")))
    val got = graft.multimodal.Decode.resizeImages(media.toDS(), maxDim = 32)
      .collect().map(r => r.doc_id -> r).toMap
    assert((got(1L).width, got(1L).height, got(1L).decoded) === ((32, 13, true)),
      "120x48 must fit 32 aspect-preserving (32, round(48*32/120)=13)")
    // the emitted payload is a real PNG of exactly those dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(got(1L).payload))
    assert((back.getWidth, back.getHeight) === ((32, 13)))
    assert((got(2L).width, got(2L).height) === ((10, 7)), "no upscale")
    assert(!got(3L).decoded && got(3L).payload.sameElements(media(2).payload),
      "undecodable payloads pass through verbatim")

    // audio: a full-scale square wave has RMS = peak = full scale;
    // silence has both 0 — the geometry comes from the real header
    def wav(samples: Array[Short], channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt,
        samples.length.toLong / channels)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val square = wav(Array.fill(400)(0x7fff.toShort), channels = 1)
    val Some((ch, rate, frames, rms, peak)) =
      graft.multimodal.Decode.audioStats(square)
    assert((ch, rate, frames) === ((1, 8000, 400L)))
    assert(math.abs(rms - 1000000L) <= 35 && math.abs(peak - 1000000L) <= 35,
      s"full-scale square wave: rms=$rms peak=$peak (x1e6)")
    val Some((_, _, _, rms0, peak0)) =
      graft.multimodal.Decode.audioStats(wav(Array.fill(100)(0.toShort), 2))
    assert(rms0 === 0L && peak0 === 0L, "silence is 0/0")
    assert(graft.multimodal.Decode.audioStats("nope".getBytes).isEmpty)
  }

  test("decode stub plumbing: mapPartitions features match column math") {
    import spark.implicits._
    val ds = Seq(
      MediaRef(1L, "image/fake", Array.fill[Byte](1000)(7)),
      MediaRef(2L, "audio/fake", Array.fill[Byte](65)(1))).toDS()
    val got = Decode.features(ds).collect().sortBy(_.doc_id)
    assert(got(0).n_bytes === 1000 && got(0).width === 64 + 1000 % 576)
    assert(got(1).n_frames === 2)
    // digest matches Spark's own md5 of the same bytes
    val sparkMd5 = ds.toDF().select(md5(col("payload"))).collect().map(_.getString(0)).toSet
    assert(got.map(_.digest).toSet === sparkMd5)
  }

  test("repetition signals: exact hand-computed shares, bounds on testdata") {
    import spark.implicits._
    // run the registered query against a synthetic documents table so
    // the expected shares are hand-checkable
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq(
      (0L, "a a a b", "en", "src0"),   // top 3/4, dup-word 2/4, dup-bigram 1/3
      (1L, "x", "en", "src0"),         // single word: no bigrams
      (2L, "p q r s", "en", "src0"))   // all unique: every share 0
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) === ((4L, 7500L, 5000L, 3333L)))
    assert(got(1L) === ((1L, 10000L, 0L, 0L)))
    assert(got(2L) === ((4L, 2500L, 0L, 0L)))

    // corpus run: shares live in [0, 10000] and the scoring stays
    // map-side — no aggregation/join shuffle. The ONE allowed exchange
    // is the gated scan fan-out (Tables.fanned, REPARTITION_BY_NUM):
    // it parallelizes the single-split test scan and disappears on a
    // multi-file corpus; any other Exchange means the per-doc
    // expressions stopped being map-side.
    val df = SparkEntry.queries("text_repetition")(spark, sf)
    val oob = df.filter(
      col("top_word_share_x1e4") < 1 || col("top_word_share_x1e4") > 10000 ||
      col("dup_word_share_x1e4") < 0 || col("dup_word_share_x1e4") > 10000 ||
      col("dup_bigram_share_x1e4") < 0 || col("dup_bigram_share_x1e4") > 10000).count()
    assert(oob === 0)
    val exchanges = df.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("Exchange"))
    assert(exchanges.forall(_.contains("REPARTITION_BY_NUM")),
      s"repetition must stay map-side above the scan fan-out; got:\n${exchanges.mkString("\n")}")
  }

  test("scrub redacts emails and IPv4s, counts them, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach bob.smith+x@sub.example.co or 10.1.255.3 and admin@ex.io via 192.168.0.1 ok"),
      (2L, "perfectly clean text with no addresses at all"),
      (3L, "version 1.2 costs 3.4 dollars")) // dotted numbers are NOT IPv4s
      .toDF("doc_id", "text")
    val got = graft.text.Scrub.scrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === ((4L,
      "reach <EMAIL> or <IP> and <EMAIL> via <IP> ok")))
    assert(got(2L) === ((0L, "perfectly clean text with no addresses at all")))
    assert(got(3L) === ((0L, "version 1.2 costs 3.4 dollars")))
  }

  test("frame sampling reconstructs full byte coverage") {
    val frames = SparkEntry.queries("mm_frame_sample")(spark, sf)
    val total = frames.agg(sum("frame_len")).head().getLong(0)
    val chars = Tables.documents(spark, sf).agg(sum(length(col("text")))).head().getLong(0)
    assert(total === chars)
  }

  test("frame near-dup finds planted shared-block pairs, df-caps universal blocks") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    // blocks are EXACTLY 64 chars so planted frame boundaries align
    def blk(c: Char): String = c.toString * 64
    val shared = blk('a') + blk('b') + blk('c')
    val docs = (Seq(
      (1L, shared + "tail one"),
      (2L, shared + "a different tail"),
      (3L, blk('x') + blk('y'))) ++
      // 25 docs all containing one universal block: df=25 > cap=20 —
      // that block must be removed from the similarity universe
      (10L to 34L).map(i => (i, blk('z') + s"unique suffix $i"))
    ).toDF("doc_id", "text")
    val pairs = Multimodal.frameNearDupPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs === Map((1L, 2L) -> 3L),
      s"expected only the planted 3-shared-block pair, got $pairs")
  }

  test("end-to-end media curation: route -> resize -> digest near-dup over the resized corpus") {
    import spark.implicits._
    import graft.multimodal.{Decode, MediaRef, Multimodal}
    // noisy deterministic pixels: re-encoded PNGs keep many distinct
    // 64-byte blocks (a flat fill would compress below minShared)
    def img(seed: Int, w: Int, h: Int, fmt: String): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        im.setRGB(x, y, (x * 2654435761L.toInt + y * 40503 + seed) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    // the re-encoded-copy shape: SAME pixels shipped in two containers
    // (png + bmp) — whole-file digests differ, pixel content does not
    val media = Seq(
      MediaRef(1L, "image", img(7, 120, 48, "png")),
      MediaRef(2L, "image", img(7, 120, 48, "bmp")),
      MediaRef(3L, "image", img(99, 120, 48, "png")),
      MediaRef(4L, "opaque", "definitely not an image payload".getBytes("UTF-8")))
    // stage 1: route on real decode — the curation filter's column
    val routed = Decode.featuresDetected(media.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    assert(Seq(1L, 2L, 3L).forall(id =>
      routed(id).modality == "image" && routed(id).decoded))
    assert(routed(4L).modality === "opaque" && !routed(4L).decoded)
    // stage 2: normalize the decodable images (downscale + PNG
    // container); the opaque row is routed out by the decoded flag
    val imgIds = routed.values.filter(_.modality == "image").map(_.doc_id).toSeq
    val resized = Decode.resizeImages(
      media.toDS().filter(col("doc_id").isin(imgIds: _*)), maxDim = 32)
    val rz = resized.collect().map(r => r.doc_id -> r).toMap
    assert(rz.values.forall(r => r.decoded && r.width == 32 && r.height == 13))
    assert(rz(1L).payload.sameElements(rz(2L).payload),
      "same pixels must normalize to byte-identical PNGs across containers")
    // stage 3: block-digest near-dup over the NORMALIZED corpus — the
    // container variance the raw payloads carried is gone, so the
    // re-encoded copy surfaces as a shared-everything pair
    val pairs = Multimodal.frameNearDupPairs(
      resized.toDF().select(col("doc_id"), col("payload").as("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      "exactly the re-encoded copy pair; the distinct image stays out")
  }

  test("event transitions: per-source probabilities normalize, counts conserve") {
    val tr = SparkEntry.queries("q_event_transitions")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    // every (user's) event except its last has exactly one successor
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(tr.map(_.getLong(2)).sum === expected)
    // x1e4 probabilities sum to ~10000 within rounding per from_type
    tr.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val p = rows.map(_.getLong(3)).sum
      assert(p >= 10000 - rows.length && p <= 10000 + rows.length,
        s"from=$from p_sum=$p")
    }
  }

  test("corpus diversity: distinct-trigram ratio per group, template collapse visible") {
    // independent tally over the collected docs
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(d => (d._1, d._2)).map { case (k, rows) =>
      val tris = rows.flatMap(_._3.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")))
      val total = rows.map(r => math.max(r._3.split(" ", -1).length - 2, 0).toLong).sum
      val nd = tris.distinct.length.toLong
      k -> ((total, nd, if (total > 0) math.floor(nd * 10000.0 / total).toLong else 0L))
    }
    val got = SparkEntry.queries("corpus_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)

    // a templated source collapses the ratio even though every doc is
    // hash-unique — the signal exact dedup cannot see
    import spark.implicits._
    val templated = (0 until 50).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i", "en", "tpl"))
    val varied = (0 until 50).map(i =>
      (100L + i, s"doc$i word${i}a word${i}b word${i}c word${i}d word${i}e", "en", "var"))
    val df = (templated ++ varied).toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-div").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("corpus_diversity")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("tpl") < 2000L, s"templated source must collapse: ${out("tpl")}")
    assert(out("var") > 8000L, s"varied source must stay diverse: ${out("var")}")
  }

  test("approx corpus diversity: <5% ratio drift vs exact, sketch-shuffle plan") {
    val exact = SparkEntry.queries("corpus_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val approx = SparkEntry.queries("corpus_diversity_approx")(spark, sf)
    val got = approx.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got.keySet === exact.keySet, "same group set as the exact form")
    got.foreach { case (k, bp) =>
      val e = exact(k)
      assert(e == 0L && bp == 0L || math.abs(bp - e) <= math.max(0.05 * e, 1.0),
        s"group $k: approx $bp vs exact $e drifts > 5%")
    }
    // the scale property the twin exists for: the exchange carries
    // partial HLL sketches, never raw trigram strings — the partial
    // aggregate (ObjectHashAggregate buffering the sketch) sits below
    // the shuffle in the physical plan
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"expected a map-side partial HLL sketch aggregate:\n$plan")
    // the exact form's plan carries the distinct expansion the twin
    // avoids — the two shapes must genuinely differ
    assert(!SparkEntry.queries("corpus_diversity")(spark, sf)
      .queryExecution.executedPlan.toString.contains("partial_approx_count_distinct"))
  }
}
