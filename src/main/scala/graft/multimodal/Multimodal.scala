package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryModule, Tables}

/** A reference to one media object: opaque bytes + typed metadata.
  * At 100 TB the payload column stays in parquet binary chunks;
  * feature extraction is partition-parallel and never collects.
  */
case class MediaRef(doc_id: Long, media_type: String, payload: Array[Byte])

case class MediaFeatures(doc_id: Long, n_bytes: Long, digest: String,
                         width: Int, height: Int, n_frames: Int)

/** [[MediaFeatures]] with real-decode provenance: `modality` is the
  * codec family that accepted the payload ("image" / "audio", or
  * "opaque" when no built-in codec did and the stub geometry stands),
  * `decoded` distinguishes measured dimensions from fallback ones —
  * the column a curation filter keys on ("drop undecodable media").
  * For audio, (width, height) carry (channels, sample bits) and
  * n_frames the PCM frame count — the resampling-cost inputs.
  */
case class MediaFeaturesDetected(doc_id: Long, n_bytes: Long, digest: String,
                                 modality: String, width: Int, height: Int,
                                 n_frames: Long, decoded: Boolean)

/** [[Decode.resizeImages]] output: the (re-encoded PNG) payload with
  * its post-resize geometry; undecodable inputs pass through verbatim
  * with `decoded = false` and −1 dimensions.
  */
case class MediaResized(doc_id: Long, width: Int, height: Int,
                        payload: Array[Byte], decoded: Boolean)

/** Multimodal column plumbing (SURVEY §2 block F).
  *
  * Decode comes in two tiers. [[Decode.decodeMeta]] is a REAL
  * header-level decoder built on the JDK's OWN codecs — zero external
  * dependencies: `javax.imageio` (PNG/JPEG/BMP/GIF/TIFF readers ship
  * with the JRE) reads image dimensions from the header without
  * materializing pixels, and `javax.sound.sampled` parses WAV/AU/AIFF
  * frame geometry; MP4/MOV video dimensions and frame counts come
  * from a hand-rolled ISO-BMFF box walk ([[Decode.mp4Meta]] — the
  * container is plain length-tagged records, no codec needed), and
  * MKV/WebM geometry from the EBML twin ([[Decode.ebmlMeta]]). With
  * every mainstream container parsed, only CONTAINER-LESS payloads
  * (raw elementary streams, novel formats) fall back to
  * [[Decode.decodeStub]], the clearly-marked deterministic fake —
  * swap a javacv/ffmpeg binding into `decodeMeta`'s None branch in
  * production; schema and call sites stay unchanged. Everything around them (binary column
  * handling, partition-wise batch decode via mapPartitions, frame
  * sampling) is the real Spark plumbing either tier drops into.
  */
object Decode {
  /** STUB decode: deterministic fake dimensions derived from the
    * payload. The fallback for payloads [[decodeMeta]]'s built-in
    * codecs reject; replace that None branch with a real
    * javacv/ffmpeg call in production — signature and call sites
    * stay unchanged.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val n = payload.length
    // 7L: Int arithmetic wraps negative past ~306 MB payloads (the
    // BIGINT oracle doesn't) — a plausible video object size
    (64 + n % 576, (64L + (n * 7L) % 416L).toInt)
  }

  /** REAL header-level decode via JDK-built-in codecs: (modality,
    * width, height, n_frames), or None when no built-in codec accepts
    * the payload. Images read dimensions from the header only
    * (`ImageReader.getWidth/getHeight` never decode pixel data — the
    * right cost model for a metadata pass over 100 TB of media);
    * audio reports (channels, sample bits, PCM frame count). Corrupt
    * or truncated payloads that a codec initially claims and then
    * chokes on fall through to None rather than failing the task —
    * at corpus scale SOME objects are always damaged, and the
    * `decoded = false` row is the signal curation acts on.
    */
  def decodeMeta(payload: Array[Byte]): Option[(String, Int, Int, Long)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis)
          return Some(("image", r.getWidth(0), r.getHeight(0), 1L))
          // NonFatal, not just IOException: JDK readers throw runtime
          // exceptions (AIOOBE, IllegalArgument) on truncated huffman/
          // LZW tables — damaged objects must route, not fail the task
        } catch { case scala.util.control.NonFatal(_) => // damaged: fall through
        } finally r.dispose()
      }
    } finally iis.close()
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val fmt = aff.getFormat
      Some(("audio", fmt.getChannels, fmt.getSampleSizeInBits,
        aff.getFrameLength.toLong))
    } catch { case scala.util.control.NonFatal(_) =>
      mp4Meta(payload).orElse(ebmlMeta(payload)) }
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Boxes in `b`'s range [from, to): (type, payloadStart, payloadEnd)
    * per ISO-BMFF framing — [size u32][type 4cc]; size 1 → a u64
    * largesize follows the type; size 0 → the box runs to `to`. A
    * malformed header (size < header length, end past the range,
    * truncated header) aborts the iteration — the caller's moov/tkhd
    * lookup then misses and the payload routes to the stub, the same
    * damaged-object posture as the image/audio tiers.
    */
  private def mp4Boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = from
    var ok = true
    while (ok && o + 8 <= to) {
      val size = be32(b, o)
      val ty = new String(b, o + 4, 4, "ISO-8859-1")
      val (pStart, end) =
        if (size == 0L) (o + 8L, to.toLong)
        else if (size == 1L) {
          if (o + 16 > to) (0L, Long.MaxValue)
          else ((o + 16).toLong,
            o + ((be32(b, o + 8) << 32) | be32(b, o + 12)))
        } else ((o + 8).toLong, o + size)
      if (end > to || end <= pStart || pStart > to) ok = false
      else {
        out += ((ty, pStart.toInt, end.toInt))
        o = end.toInt
      }
    }
    out.result()
  }

  /** MP4 / ISO-BMFF header parse — JDK-only, shrinking the declared
    * decode stub to MKV/WebM: the container is plain length-tagged
    * records (ISO/IEC 14496-12 box framing), so video dimensions and
    * frame counts need no codec. Claims a payload only when its FIRST
    * box is `ftyp` (the brand header every MP4/MOV writer emits
    * first — four random bytes must not route as video), then walks
    * moov → trak → tkhd for the first track with a nonzero 16.16
    * fixed-point width (the video track; audio tracks carry 0×0) and
    * that same trak's mdia → minf → stbl → stts for the sample
    * (frame) count. Returns ("video", width, height, n_frames);
    * n_frames 0 when stts is absent. Any structural damage — size
    * running past the buffer, truncated boxes, missing moov/tkhd —
    * yields None and the payload falls to [[decodeStub]] like every
    * other undecodable object.
    */
  private[graft] def mp4Meta(payload: Array[Byte]): Option[(String, Int, Int, Long)] =
    try {
      val top = mp4Boxes(payload, 0, payload.length)
      if (top.headOption.forall(_._1 != "ftyp")) return None
      def kids(r: (String, Int, Int)): Seq[(String, Int, Int)] =
        mp4Boxes(payload, r._2, r._3)
      val hit = for {
        moov <- top.find(_._1 == "moov").toSeq
        trak <- kids(moov).filter(_._1 == "trak")
        tkhd <- kids(trak).find(_._1 == "tkhd").toSeq
        p = tkhd._2
        v = payload(p) & 0xff
        wOff = p + (if (v == 1) 88 else 76)
        if wOff + 8 <= tkhd._3
        w = (be32(payload, wOff) >> 16).toInt
        h = (be32(payload, wOff + 4) >> 16).toInt
        if w > 0 && h > 0
      } yield {
        val frames = (for {
          mdia <- kids(trak).find(_._1 == "mdia")
          minf <- kids(mdia).find(_._1 == "minf")
          stbl <- kids(minf).find(_._1 == "stbl")
          stts <- kids(stbl).find(_._1 == "stts")
          // A truncated stts (payload < 8 bytes) must degrade to
          // frames = 0, not AIOOBE out through the outer catch and
          // drop the already-parsed width/height.
          if stts._2 + 8 <= stts._3
          n = be32(payload, stts._2 + 4)
          if stts._2 + 8 + n * 8 <= stts._3
        } yield (0L until n).map(i => be32(payload, (stts._2 + 8 + i * 8).toInt)).sum)
          .getOrElse(0L)
        ("video", w, h, frames)
      }
      hit.headOption
    } catch { case scala.util.control.NonFatal(_) => None }

  // --- EBML / Matroska / WebM header parse ---------------------------
  /** EBML variable-length SIZE at offset `o`: (value, bytesConsumed),
    * or None when truncated/invalid. The first byte's leading-one
    * position gives the length (1-8 bytes); the marker bit is
    * STRIPPED from the value. An all-ones value payload means
    * "unknown size" (live-streamed segments) → value −1, the caller
    * extends the element to its container's end.
    */
  private def ebmlSize(b: Array[Byte], o: Int): Option[(Long, Int)] = {
    if (o >= b.length) return None
    val fb = b(o) & 0xff
    if (fb == 0) return None
    val len = 8 - (31 - Integer.numberOfLeadingZeros(fb))
    if (o + len > b.length) return None
    var v = (fb & (0x7f >> (len - 1))).toLong
    var unknown = v == (0x7f >> (len - 1)).toLong
    var i = 1
    while (i < len) {
      val x = b(o + i) & 0xffL
      if (x != 0xffL) unknown = false
      v = (v << 8) | x
      i += 1
    }
    Some((if (unknown) -1L else v, len))
  }

  /** EBML element ID at offset `o`: (id INCLUDING its marker bits —
    * the form IDs are quoted in, e.g. Segment 0x18538067), or None.
    */
  private def ebmlId(b: Array[Byte], o: Int): Option[(Long, Int)] = {
    if (o >= b.length) return None
    val fb = b(o) & 0xff
    if (fb == 0) return None
    val len = 8 - (31 - Integer.numberOfLeadingZeros(fb))
    if (len > 4 || o + len > b.length) return None
    var v = fb.toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    Some((v, len))
  }

  /** Child elements of range [from, to): (id, payloadStart,
    * payloadEnd). Malformed framing aborts the walk — the caller's
    * lookup misses and the payload routes to the stub, the
    * damaged-object posture shared with [[mp4Boxes]].
    */
  private def ebmlKids(b: Array[Byte], from: Int, to: Int): Seq[(Long, Int, Int)] = {
    val out = Seq.newBuilder[(Long, Int, Int)]
    var o = from
    var ok = true
    while (ok && o < to) {
      (for {
        (id, idLen) <- ebmlId(b, o)
        (sz, szLen) <- ebmlSize(b, o + idLen)
      } yield {
        val pStart = o + idLen + szLen
        val end = if (sz < 0) to.toLong else pStart + sz
        if (end > to || pStart > to) ok = false
        else { out += ((id, pStart, end.toInt)); o = end.toInt }
      }).getOrElse { ok = false }
    }
    out.result()
  }

  private def ebmlUint(b: Array[Byte], from: Int, to: Int): Long = {
    var v = 0L; var i = from
    while (i < to) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Matroska / WebM header parse — JDK-only, the EBML twin of
    * [[mp4Meta]], closing the last declared container stub: EBML is
    * plain (id varint, size varint, payload) framing, so track
    * geometry needs no codec. Claims a payload only when its FIRST
    * element is the EBML header (0x1A45DFA3 — random bytes must not
    * route as video), then walks Segment → Tracks → TrackEntry for
    * the first video track's Video{PixelWidth, PixelHeight}
    * (("video", w, h, nFrames) where nFrames counts that track's
    * SimpleBlocks / BlockGroup Blocks across all Clusters — each
    * block's first varint is its track number), or, in a file with
    * no video track, the first audio track's Audio{Channels,
    * BitDepth} (("audio", channels, bitDepth, 0) — bit depth is
    * optional in Matroska, 0 when absent, sampling rate is a float
    * the integer contract cannot carry). Unknown-size segments (live
    * captures) extend to the buffer end. Any structural damage yields
    * None and the payload falls to [[decodeStub]].
    */
  private[graft] def ebmlMeta(payload: Array[Byte]): Option[(String, Int, Int, Long)] =
    try {
      val top = ebmlKids(payload, 0, payload.length)
      if (top.headOption.forall(_._1 != 0x1A45DFA3L)) return None
      val SEGMENT = 0x18538067L; val TRACKS = 0x1654AE6BL
      val TRACK_ENTRY = 0xAEL; val TRACK_NUMBER = 0xD7L; val TRACK_TYPE = 0x83L
      val VIDEO = 0xE0L; val PIX_W = 0xB0L; val PIX_H = 0xBAL
      val AUDIO = 0xE1L; val CHANNELS = 0x9FL; val BIT_DEPTH = 0x6264L
      val CLUSTER = 0x1F43B675L; val SIMPLE_BLOCK = 0xA3L
      val BLOCK_GROUP = 0xA0L; val BLOCK = 0xA1L
      def u(e: (Long, Int, Int)): Long = ebmlUint(payload, e._2, e._3)
      val hit = for {
        seg <- top.find(_._1 == SEGMENT).toSeq
        segKids = ebmlKids(payload, seg._2, seg._3)
        tracks <- segKids.find(_._1 == TRACKS).toSeq
        entries = ebmlKids(payload, tracks._2, tracks._3).filter(_._1 == TRACK_ENTRY)
          .map(t => ebmlKids(payload, t._2, t._3))
        video = entries.find(_.exists(_._1 == VIDEO))
        audio = entries.find(_.exists(_._1 == AUDIO))
        meta <- video.flatMap { t =>
          val vk = ebmlKids(payload, t.find(_._1 == VIDEO).get._2,
            t.find(_._1 == VIDEO).get._3)
          for {
            w <- vk.find(_._1 == PIX_W).map(u)
            h <- vk.find(_._1 == PIX_H).map(u)
            if w > 0 && h > 0
          } yield {
            // frame count: this track's blocks across all clusters
            // (each block's first varint is the track number)
            val trackNo = t.find(_._1 == TRACK_NUMBER).map(u).getOrElse(-1L)
            val frames = segKids.filter(_._1 == CLUSTER).map { c =>
              val blocks = ebmlKids(payload, c._2, c._3).flatMap {
                case (SIMPLE_BLOCK, s, e) => Seq((s, e))
                case (BLOCK_GROUP, s, e) =>
                  ebmlKids(payload, s, e).collect { case (BLOCK, bs, be) => (bs, be) }
                case _ => Nil
              }
              blocks.count { case (s, _) =>
                ebmlSize(payload, s).exists(_._1 == trackNo) }.toLong
            }.sum
            ("video", w.toInt, h.toInt, frames)
          }
        }.orElse(audio.flatMap { t =>
          val ak = ebmlKids(payload, t.find(_._1 == AUDIO).get._2,
            t.find(_._1 == AUDIO).get._3)
          ak.find(_._1 == CHANNELS).map(u).map(ch =>
            ("audio", ch.toInt,
              ak.find(_._1 == BIT_DEPTH).map(u).getOrElse(0L).toInt, 0L))
        }).toSeq
      } yield meta
      hit.headOption
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Pixel-tier image transform — the vision-model preprocessing
    * shape: decode, aspect-preserving downscale to fit `maxDim`,
    * re-encode as PNG, all with JDK codecs (headless-safe AWT raster
    * ops; no external libs). Payloads no image codec accepts pass
    * through UNCHANGED with `decoded = false` (width/height −1) — a
    * mixed-modality corpus maps through in one pass and the flag
    * routes. Images already within `maxDim` re-encode without
    * scaling (normalizing the container to PNG — the usual training
    * prep contract). Partition-wise; pixels live only inside the
    * task.
    */
  def resizeImages(ds: Dataset[MediaRef], maxDim: Int): Dataset[MediaResized] = {
    import ds.sparkSession.implicits._
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    ds.mapPartitions { it =>
      it.map { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) MediaResized(m.doc_id, -1, -1, m.payload, decoded = false)
        else {
          val scale = math.min(1.0,
            maxDim.toDouble / math.max(img.getWidth, img.getHeight))
          val w = math.max(1, math.rint(img.getWidth * scale).toInt)
          val h = math.max(1, math.rint(img.getHeight * scale).toInt)
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaResized(m.doc_id, w, h, bos.toByteArray, decoded = true)
        }
      }
    }
  }

  /** Pixel-tier audio features: decode the PCM stream (JDK
    * `javax.sound.sampled`) and fold sample statistics — RMS and peak
    * amplitude in 1e6-scaled units of full scale, plus the decoded
    * geometry. The silence/clipping screen an audio-curation pass
    * keys on. Returns None for payloads no audio codec accepts or
    * non-16-bit encodings (the stub routes those rows; production
    * swaps a resampler in here). Streams the payload — no
    * whole-buffer sample array.
    */
  def audioStats(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val le = !fmt.isBigEndian
        val buf = new Array[Byte](8192)
        var sumSq = 0.0; var peak = 0L; var n = 0L
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s = (if (le) ((buf(i + 1).toInt << 8) | (buf(i) & 0xff))
              else ((buf(i).toInt << 8) | (buf(i + 1) & 0xff))).toShort.toLong
            sumSq += (s * s).toDouble
            if (math.abs(s) > peak) peak = math.abs(s)
            n += 1
            i += 2
          }
          read = ais.read(buf)
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0
        Some((fmt.getChannels, fmt.getSampleRate.toInt, ais.getFrameLength,
          math.rint(rms * 1e6).toLong, math.rint(peak * 1e6 / 32768.0).toLong))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-wise REAL feature extraction — [[features]]' plumbing
    * with [[decodeMeta]] first and the stub as the per-payload
    * fallback (`decoded` records which path ran). One JVM-side pass
    * per partition; payloads never leave the executor.
    */
  def featuresDetected(ds: Dataset[MediaRef]): Dataset[MediaFeaturesDetected] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        md.reset()
        decodeMeta(m.payload) match {
          case Some((mod, w, h, f)) =>
            MediaFeaturesDetected(m.doc_id, m.payload.length.toLong, digest,
              mod, w, h, f, decoded = true)
          case None =>
            val (w, h) = decodeStub(m.payload)
            MediaFeaturesDetected(m.doc_id, m.payload.length.toLong, digest,
              "opaque", w, h, m.payload.length / 64 + 1, decoded = false)
        }
      }
    }
  }

  /** Partition-wise feature extraction — the Scala analogue of a
    * pandas-UDF/mapInPandas decode: one JVM-side pass per partition,
    * no per-row task overhead, no driver collection.
    */
  def features(ds: Dataset[MediaRef]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h) = decodeStub(m.payload)
        val digest = md.digest(m.payload).map("%02x".format(_)).mkString
        md.reset()
        MediaFeatures(m.doc_id, m.payload.length.toLong, digest, w, h,
          m.payload.length / 64 + 1)
      }
    }
  }
}

object Multimodal extends QueryModule {

  /** documents.text bytes standing in as the opaque media payload. */
  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"))

  // --- per-object binary features (with stubbed decode metadata) -----
  private def binaryFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = media(s, d).as[MediaRef]
    Decode.features(ds).toDF()
      .select(col("doc_id"), col("n_bytes"), col("digest"),
        col("width").cast(LongType).as("width"),
        col("height").cast(LongType).as("height"),
        col("n_frames").cast(LongType).as("n_frames"))
  }

  // Oracle mirrors the stub formulas on the raw bytes.
  private val binaryFeaturesSql =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST(64 + strlen(text) % 576 AS BIGINT) AS width,
      |  CAST(64 + (strlen(text) * 7) % 416 AS BIGINT) AS height,
      |  CAST(strlen(text) // 64 + 1 AS BIGINT) AS n_frames
      |FROM documents""".stripMargin

  // --- deterministic frame sampling: stride-64 windows ---------------
  private def frameSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      // frame count derives from BYTE length (oracle uses strlen) and
      // empty docs emit no frames — note (bytes-1) div 64 would
      // truncate toward zero where the oracle's // floors, so the
      // empty case must not reach the div
      .withColumn("n_bytes", length(col("text").cast("binary")))
      .select(col("doc_id"), col("text"),
        posexplode(when(col("n_bytes") > 0,
          sequence(lit(0), expr("(n_bytes - 1) div 64").cast("int")))
          .otherwise(array())).as(Seq("p", "frame_no")))
      .select(col("doc_id"), col("frame_no").cast(LongType).as("frame_no"),
        md5(expr("substring(text, frame_no * 64 + 1, 64)")).as("frame_digest"),
        length(expr("substring(text, frame_no * 64 + 1, 64)")).cast(LongType).as("frame_len"))

  private val frameSampleSql =
    """SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
      |  md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_digest,
      |  CAST(length(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS BIGINT) AS frame_len
      |FROM documents, UNNEST(generate_series(0, (strlen(text) - 1) // 64)) AS t(i)""".stripMargin

  // --- modality routing by magic bytes -------------------------------
  /** Detected modality of an opaque payload from its leading magic
    * bytes (JPEG/PNG/GIF/WAV/MP4), the dispatch step before a
    * per-modality decode stage: `route(df).groupBy("modality")` fans a
    * mixed media lake out to the right decoder without trusting
    * file extensions or metadata columns. A pure projection on the
    * payload's first 12 bytes — at scale, substring BEFORE hex so only
    * the prefix is materialized, never the payload. Unknown prefixes
    * fall through to application/octet-stream (this corpus's text
    * payloads all do; real-container detection is spec-proven on
    * injected JPEG/PNG/GIF/WAV/MP4 headers).
    */
  def routeModality(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val hx = hex(substring(col(payloadCol), 1, 12))
    val modality =
      when(substring(hx, 1, 6) === "FFD8FF", "image/jpeg")
        .when(substring(hx, 1, 8) === "89504E47", "image/png")
        .when(substring(hx, 1, 8) === "47494638", "image/gif")
        .when(substring(hx, 1, 8) === "52494646" &&
          substring(hx, 17, 8) === "57415645", "audio/wav")
        .when(substring(hx, 9, 8) === "66747970", "video/mp4")
        .otherwise("application/octet-stream")
    df.withColumn("modality", modality)
  }

  private def modalityRoute(s: SparkSession, d: String): DataFrame =
    routeModality(media(s, d))
      .select(col("doc_id"), col("modality"),
        length(col("payload")).cast(LongType).as("n_bytes"))

  private val modalityRouteSql =
    """WITH h AS (
      |  SELECT doc_id, substring(hex(encode(text)), 1, 24) AS hx,
      |         CAST(strlen(text) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN substring(hx, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
      |       WHEN substring(hx, 1, 8) = '89504E47' THEN 'image/png'
      |       WHEN substring(hx, 1, 8) = '47494638' THEN 'image/gif'
      |       WHEN substring(hx, 1, 8) = '52494646'
      |            AND substring(hx, 17, 8) = '57415645' THEN 'audio/wav'
      |       WHEN substring(hx, 9, 8) = '66747970' THEN 'video/mp4'
      |       ELSE 'application/octet-stream' END AS modality,
      |  n_bytes
      |FROM h""".stripMargin

  // --- media near-dup by shared content blocks ------------------------
  /** Media-object near-dup pairs: objects sharing >= `minShared`
    * distinct stride-64 content-block digests — the payload-level
    * analogue of shingle dedup (re-encoded copies, watermarked
    * variants, and container-wrapped reposts share most raw blocks
    * even when whole-file digests differ). Same scale posture as
    * `dedup_ngram_jaccard`: per-object distinct block digests, blocks
    * present in more than max(20, 0.5%·N) objects df-capped OUT of the
    * similarity universe (an all-zeros block or shared codec header
    * would otherwise make the block self-join quadratic in its df),
    * then ONE equi-join on digest + groupBy pair. Pair volume is
    * bounded by cap · |block rows| — linear in the corpus for a fixed
    * cap. Digests (16 B) travel the joins; payload bytes never leave
    * the scan.
    */
  def frameNearDupPairs(docs: DataFrame, minShared: Long = 3L): DataFrame = {
    // cached: the payload explode + md5 is the dominant cost and feeds
    // THREE consumers (the df-cap count and both self-join sides;
    // Spark does not dedupe common subplans) — same discipline as
    // Dedup.minhashPairs' shingle cache, released by the session's
    // clearCache like every pair helper
    val frames = docs
      .withColumn("n_bytes", length(col("text").cast("binary")))
      .select(col("doc_id"),
        explode(when(col("n_bytes") > 0,
          sequence(lit(0), expr("(n_bytes - 1) div 64").cast("int")))
          .otherwise(array())).as("frame_no"), col("text"))
      .select(col("doc_id"),
        md5(expr("substring(text, frame_no * 64 + 1, 64)")).as("fd"))
      .distinct()
      .cache()
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val keep = frames.groupBy("fd").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= greatest(lit(20L), ceil(col("n_docs") * 0.005)))
      .select("fd")
    val fc = frames.join(keep, "fd")
    fc.as("a").join(fc.as("b"),
        col("a.fd") === col("b.fd") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  private def frameNearDup(s: SparkSession, d: String): DataFrame =
    // NOT fanned: the cached digest frame's three consumer stages are
    // cheaper at AQE's coalesced width (bench A/B r15: +0.13 s fanned)
    frameNearDupPairs(Tables.documents(s, d))

  private val frameNearDupSql =
    """WITH fr AS (
      |  SELECT DISTINCT doc_id,
      |    md5(substr(text, CAST(i * 64 + 1 AS INT), 64)) AS fd
      |  FROM documents, UNNEST(generate_series(0, (strlen(text) - 1) // 64)) AS t(i)),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      |keep AS (
      |  SELECT fd FROM fr, nd GROUP BY fd, n_docs
      |  HAVING COUNT(*) <= GREATEST(20, CAST(CEIL(n_docs * 0.005) AS BIGINT))),
      |fc AS (SELECT fr.doc_id, fr.fd FROM fr JOIN keep USING (fd))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_frames
      |FROM fc a JOIN fc b ON a.fd = b.fd AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_features" -> (binaryFeatures _),
    "mm_frame_sample"    -> (frameSample _),
    "mm_frame_neardup"   -> (frameNearDup _),
    "mm_modality_route"  -> (modalityRoute _))

  override val oracleSql: Map[String, String] = Map(
    "mm_binary_features" -> binaryFeaturesSql,
    "mm_frame_sample"    -> frameSampleSql,
    "mm_frame_neardup"   -> frameNearDupSql,
    "mm_modality_route"  -> modalityRouteSql)
}
