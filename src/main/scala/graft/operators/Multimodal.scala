package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-at-a-time on executors.
  *
  * No reference counterpart (SURVEY.md §2e) — north-star extension. The
  * container ships no media codecs, so the DECODE step is a deterministic
  * stub ([[FakeCodec]]) behind the same interface a real codec (javacv /
  * ffmpeg-pipe / JNI) would implement. Everything AROUND the decode — the
  * schema contract, binary column handling, partition-wise batching via
  * mapPartitions (the JVM analogue of mapInPandas: one iterator per
  * partition, codec state initialized once per partition, never per row) —
  * is real and tested.
  *
  * Scale design:
  *  - media bytes never pass through the driver; rows flow
  *    partition-at-a-time through the codec;
  *  - decoded features are fixed-width arrays (bounded memory per row);
  *  - frame sampling is uniform-stride on the byte payload, so per-row cost
  *    is O(frames), not O(payload).
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  final case class MediaMeta(
      mediaId: Long,
      kind: String,          // "image" | "audio" | "video"
      nBytes: Long,
      contentHash: String)

  /** Decoded, fixed-shape features: the contract a real decoder fills. */
  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      width: Int,
      height: Int,
      nFrames: Int,
      // fixed-width feature vector (e.g. pooled pixels / mel means)
      features: Array[Float])

  /** Codec interface — ONE instance per partition (stateful codecs are
    * expensive to init; never construct per row). */
  trait Codec extends Serializable {
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures
  }

  /** STUB codec (no media libs in this container): deterministic fake that
    * derives plausible fixed-shape output purely from the payload bytes.
    * A real implementation swaps in here; nothing else changes. */
  final class FakeCodec(featureDim: Int = 8) extends Codec {
    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val feats = Array.tabulate(featureDim) { i =>
        // uniform-stride byte sampling — O(featureDim), not O(n)
        if (n == 0) 0f else (payload(((i.toLong * n) / featureDim).toInt % n) & 0xff) / 255f
      }
      MediaFeatures(
        mediaId = mediaId,
        kind = kind,
        width = 64 + n % 192,
        height = 64 + (n / 7) % 192,
        nFrames = if (kind == "video") 1 + n % 30 else 1,
        features = feats)
    }
  }

  /** REAL codec for binary PPM/PGM (netpbm P6/P5) — an uncompressed format
    * decodable in pure JVM, so the [[Codec]] interface is proven with
    * actual pixel decoding, not just the [[FakeCodec]] stub: width/height
    * come from the parsed header, features from the decoded pixel bytes.
    * Of the compressed formats, PNG/BMP/GIF/JPEG decode via
    * [[ImageIoCodec]], WAV via [[WavCodec]], MP3 frame headers via
    * [[Mp3Codec]], MP4 box metadata via [[Mp4Codec]] — [[FakeCodec]]
    * remains only as the interface stub for genuinely unknown formats;
    * NOTHING else in the pipeline changes — that is the point of the
    * trait.
    *
    * Features: `bands` equal slices of the raster in scan order, each
    * emitting its mean pixel value (sum/size in double, narrowed to
    * float) — deterministic integer-sum arithmetic an external oracle can
    * replay exactly. Malformed payloads fail loudly (a training pipeline
    * must quarantine bad media, not silently fabricate features). */
  final class PpmCodec(bands: Int = 8) extends Codec {
    require(bands > 0, "bands must be positive")

    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      var pos = 0
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"PpmCodec: $msg (media_id=$mediaId)")
      def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
      // whitespace + '#' comment lines are legal anywhere in the header
      def skipWs(): Unit = {
        var more = true
        while (more && pos < payload.length) {
          if (isWs(payload(pos))) pos += 1
          else if (payload(pos) == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else more = false
        }
      }
      def readInt(): Int = {
        skipWs()
        val start = pos
        var v = 0L
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1
          if (v > Int.MaxValue) fail("header number overflows")
        }
        if (pos == start) fail(s"expected integer at byte $pos")
        v.toInt
      }
      if (payload.length < 2 || payload(0) != 'P') fail("not a netpbm payload")
      val channels = payload(1) match {
        case '5' => 1 // PGM: grayscale
        case '6' => 3 // PPM: RGB
        case m   => fail(s"unsupported magic P${m.toChar}")
      }
      pos = 2
      val width  = readInt()
      val height = readInt()
      val maxval = readInt()
      if (width <= 0 || height <= 0) fail(s"bad dimensions ${width}x$height")
      if (maxval <= 0 || maxval > 255) fail(s"maxval $maxval unsupported (1-byte samples only)")
      pos += 1 // exactly ONE whitespace byte separates header from raster
      // Long arithmetic: a crafted 65536x65536 header would wrap an Int
      // product to 0 and slip past the truncation check — fail loudly
      // instead (malformed payloads never fabricate features).
      val nL = width.toLong * height * channels
      if (nL > Int.MaxValue) fail(s"raster size $nL overflows supported range")
      val n = nL.toInt
      if (payload.length - pos < n) fail(s"truncated raster: need $n bytes, have ${payload.length - pos}")
      val feats = new Array[Float](bands)
      var b = 0
      while (b < bands) {
        // band = equal slice of the raster in scan order; integer sums make
        // the mean exactly reproducible by any engine
        val from = (b.toLong * n / bands).toInt
        val to   = ((b + 1).toLong * n / bands).toInt
        var s = 0L
        var i = from
        while (i < to) { s += (payload(pos + i) & 0xff); i += 1 }
        feats(b) = if (to > from) (s.toDouble / (to - from)).toFloat else 0f
        b += 1
      }
      MediaFeatures(mediaId, "image", width, height, nFrames = 1, features = feats)
    }
  }

  /** REAL codec for the formats the JDK ships decoders for — PNG, BMP,
    * GIF, JPEG via `javax.imageio` (no external media libs needed, so the
    * "container has no codecs" constraint doesn't bind for images). Same
    * feature contract as [[PpmCodec]]: `bands` equal slices of the
    * channel-interleaved RGB raster in scan order (sample k = (y·w + x)·3
    * + channel), each emitting its integer-sum mean — deterministic
    * arithmetic an external oracle can replay from the source pixels.
    * Audio decodes via [[WavCodec]]/[[Mp3Codec]], MP4 metadata via
    * [[Mp4Codec]].
    *
    * One codec instance per partition as usual; `ImageIO` stream caching
    * is disabled (in-memory payloads — a temp-file cache per row would be
    * pure overhead on an executor). Malformed/unsupported payloads fail
    * loudly, never fabricate features. */
  final class ImageIoCodec(bands: Int = 8) extends Codec {
    require(bands > 0, "bands must be positive")

    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"ImageIoCodec: $msg (media_id=$mediaId)")
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case e: java.io.IOException => fail(s"decode error: ${e.getMessage}") }
      if (img == null) fail("unsupported or corrupt image payload")
      val width  = img.getWidth
      val height = img.getHeight
      // Long arithmetic — same overflow contract as PpmCodec
      val nL = width.toLong * height * 3
      if (nL > Int.MaxValue) fail(s"raster size $nL overflows supported range")
      val n     = nL.toInt
      val feats = new Array[Float](bands)
      var b = 0
      while (b < bands) {
        val from = (b.toLong * n / bands).toInt
        val to   = ((b + 1).toLong * n / bands).toInt
        var s = 0L
        var k = from
        while (k < to) {
          val px  = k / 3
          val rgb = img.getRGB(px % width, px / width)
          s += ((k % 3: @annotation.switch) match {
            case 0 => (rgb >> 16) & 0xff
            case 1 => (rgb >> 8) & 0xff
            case _ => rgb & 0xff
          })
          k += 1
        }
        feats(b) = if (to > from) (s.toDouble / (to - from)).toFloat else 0f
        b += 1
      }
      MediaFeatures(mediaId, "image", width, height, nFrames = 1, features = feats)
    }
  }

  /** REAL codec for RIFF/WAVE audio through the JDK's own
    * `javax.sound.sampled` parser (the WAVE file reader ships with the JDK
    * and needs no audio device — the "no media libs" constraint doesn't
    * bind for WAV either; [[Mp3Codec]] walks MP3 frame headers,
    * [[Mp4Codec]] MP4 boxes). Feature contract
    * mirrors [[ImageIoCodec]] with the audio analog of dimensions:
    * `width` = sample rate (Hz), `height` = channel count, `nFrames` =
    * sample frames; `features` = `bands` equal slices of the
    * channel-INTERLEAVED 16-bit sample stream in frame order (sample k =
    * frame·channels + channel), each emitting its integer-sum mean —
    * deterministic arithmetic an external oracle replays from the sample
    * formula. Only 16-bit signed PCM is accepted; anything else — or a
    * truncated/corrupt RIFF — fails loudly, never fabricates features. */
  final class WavCodec(bands: Int = 8) extends Codec {
    require(bands > 0, "bands must be positive")

    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"WavCodec: $msg (media_id=$mediaId)")
      val ais =
        try
          javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            fail(s"not a parseable audio container: ${e.getMessage}")
          case e: java.io.IOException => fail(s"decode error: ${e.getMessage}")
        }
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        fail(s"only signed PCM supported, got ${fmt.getEncoding}")
      if (fmt.getSampleSizeInBits != 16)
        fail(s"only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}-bit")
      val channels = fmt.getChannels
      val bytes =
        try ais.readAllBytes()
        catch { case e: java.io.IOException => fail(s"raster read error: ${e.getMessage}") }
      if (bytes.length % (2 * channels) != 0)
        fail(s"truncated PCM payload: ${bytes.length} bytes for $channels channel(s)")
      val n = bytes.length / 2 // interleaved 16-bit samples
      def sample(k: Int): Int =
        if (fmt.isBigEndian) (bytes(2 * k) << 8) | (bytes(2 * k + 1) & 0xff)
        else (bytes(2 * k + 1) << 8) | (bytes(2 * k) & 0xff)
      val feats = new Array[Float](bands)
      var b = 0
      while (b < bands) {
        val from = (b.toLong * n / bands).toInt
        val to   = ((b + 1).toLong * n / bands).toInt
        var s = 0L
        var k = from
        while (k < to) { s += sample(k); k += 1 }
        feats(b) = if (to > from) (s.toDouble / (to - from)).toFloat else 0f
        b += 1
      }
      MediaFeatures(
        mediaId,
        "audio",
        width = fmt.getSampleRate.toInt,
        height = channels,
        nFrames = n / channels,
        features = feats)
    }
  }

  /** REAL parser for MPEG-1 Layer III (MP3) FRAME HEADERS — pure JVM, no
    * PCM synthesis (a full Huffman/IMDCT decoder is a codec library's job;
    * the header walk is not): rate/channels come from the first frame
    * header, duration from the frame count (each MPEG-1 Layer III frame
    * carries exactly 1152 sample frames), and the walk validates EVERY
    * frame's sync/version/layer/bitrate and advances by the computed frame
    * length `144·bitrate/rate + padding` — a truncated or corrupt stream
    * fails loudly mid-walk, never fabricates metadata. An ID3v2 prefix tag
    * is skipped via its syncsafe size; headers must agree on rate/mode
    * across frames (VBR bitrate may vary).
    *
    * Same output contract as [[WavCodec]] with the same audio analogs:
    * `width` = sample rate (Hz), `height` = channels, `nFrames` = SAMPLE
    * frames (mpeg frames × 1152, so duration = nFrames/rate either
    * format). Features: `bands` equal slices of the walked byte stream
    * (headers + payloads, unsigned) in scan order, each emitting its
    * integer-sum mean — without PCM the bytes ARE the deterministic
    * content, and an oracle replays the means from the byte formula of a
    * synthetic fixture ([[syntheticMp3]]). */
  final class Mp3Codec(bands: Int = 8) extends Codec {
    require(bands > 0, "bands must be positive")
    // MPEG-1 Layer III bitrates (kbps) by header index; 0=free and 15=bad
    private val Bitrates =
      Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
    private val Rates = Array(44100, 48000, 32000, -1)

    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"Mp3Codec: $msg (media_id=$mediaId)")
      var pos = 0
      // ID3v2 prefix: "ID3" + version(2) + flags(1) + syncsafe size(4)
      if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
        val size = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
          ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
        pos = 10 + size
        if (pos > payload.length) fail("ID3v2 tag size exceeds payload")
      }
      val start = pos
      var rate      = -1
      var channels  = -1
      var mpegFrames = 0
      while (pos < payload.length) {
        if (pos + 4 > payload.length) fail(s"truncated frame header at byte $pos")
        val b0 = payload(pos) & 0xff
        val b1 = payload(pos + 1) & 0xff
        val b2 = payload(pos + 2) & 0xff
        val b3 = payload(pos + 3) & 0xff
        if (b0 != 0xff || (b1 & 0xe0) != 0xe0) fail(s"lost sync at byte $pos")
        if ((b1 & 0x18) >> 3 != 3) fail(s"only MPEG-1 supported (header at byte $pos)")
        if ((b1 & 0x06) >> 1 != 1) fail(s"only Layer III supported (header at byte $pos)")
        val bitrate = Bitrates((b2 & 0xf0) >> 4)
        if (bitrate <= 0) fail(s"free/bad bitrate index at byte $pos")
        val r = Rates((b2 & 0x0c) >> 2)
        if (r <= 0) fail(s"bad sample-rate index at byte $pos")
        val padding = (b2 & 0x02) >> 1
        val ch      = if (((b3 & 0xc0) >> 6) == 3) 1 else 2
        if (rate < 0) { rate = r; channels = ch }
        else if (r != rate || ch != channels)
          fail(s"inconsistent rate/mode at byte $pos ($r Hz/$ch ch vs $rate Hz/$channels ch)")
        val frameLen = 144 * bitrate * 1000 / rate + padding
        if (pos + frameLen > payload.length) fail(s"truncated frame at byte $pos (need $frameLen)")
        pos += frameLen
        mpegFrames += 1
      }
      if (mpegFrames == 0) fail("no MPEG frames in payload")
      val n     = pos - start
      val feats = new Array[Float](bands)
      var b = 0
      while (b < bands) {
        val from = (b.toLong * n / bands).toInt
        val to   = ((b + 1).toLong * n / bands).toInt
        var s = 0L
        var i = from
        while (i < to) { s += (payload(start + i) & 0xff); i += 1 }
        feats(b) = if (to > from) (s.toDouble / (to - from)).toFloat else 0f
        b += 1
      }
      MediaFeatures(
        mediaId,
        "audio",
        width = rate,
        height = channels,
        nFrames = mpegFrames * 1152, // MPEG-1 Layer III: 1152 sample frames/frame
        features = feats)
    }
  }

  /** REAL parser for MP4 (ISO BMFF) BOX STRUCTURE — pure JVM, no sample
    * decode (an H.264/AAC decoder is a codec library's job; the box walk
    * is not): duration metadata comes from `moov/mvhd`
    * (timescale+duration), frame count from the first video track's
    * `stbl/stts` sample-count sum (the authoritative per-track sample
    * table — a genuine header-only fact, not an estimate), width/height
    * from that track's `tkhd` 16.16 fixed-point fields, and features are
    * band means over the `mdat` payload bytes. The walk validates every
    * box size against its container and fails loudly on truncation,
    * 64-bit sizes, or a missing moov/mvhd/video-trak/stts/mdat — never
    * fabricates metadata. With this codec only nothing routes to
    * [[FakeCodec]] except genuinely unknown formats.
    *
    * Output contract: `width`/`height` = video track pixel dims,
    * `nFrames` = stts sample count, and `kind` is reported as "video". */
  final class Mp4Codec(bands: Int = 8) extends Codec {
    require(bands > 0, "bands must be positive")

    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"Mp4Codec: $msg (media_id=$mediaId)")
      def u32(p: Int): Long = {
        if (p + 4 > payload.length) fail(s"truncated u32 at byte $p")
        ((payload(p) & 0xffL) << 24) | ((payload(p + 1) & 0xffL) << 16) |
          ((payload(p + 2) & 0xffL) << 8) | (payload(p + 3) & 0xffL)
      }
      def typ(p: Int): String =
        new String(payload, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // iterate child boxes of [from, to) invoking f(type, payloadFrom, payloadTo)
      def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
        var p = from
        while (p < to) {
          if (p + 8 > to) fail(s"truncated box header at byte $p")
          val size = u32(p)
          if (size == 1) fail(s"64-bit box size unsupported at byte $p")
          if (size < 8) fail(s"bad box size $size at byte $p")
          if (p + size > to) fail(s"box overruns container at byte $p (size $size)")
          f(typ(p + 4), p + 8, (p + size).toInt)
          p += size.toInt
        }
      }
      var timescale   = -1L
      var durationTk  = -1L
      var vidW        = -1
      var vidH        = -1
      var sttsFrames  = -1L
      var mdatFrom    = -1
      var mdatTo      = -1
      walk(0, payload.length) {
        case ("moov", mFrom, mTo) =>
          walk(mFrom, mTo) {
            case ("mvhd", f, t) =>
              val ver = payload(f) & 0xff
              if (ver != 0) fail("only mvhd version 0 supported")
              if (t - f < 100) fail("mvhd box too small")
              timescale = u32(f + 12)
              durationTk = u32(f + 16)
            case ("trak", tkFrom, tkTo) =>
              var w      = -1
              var h      = -1
              var isVide = false
              var frames = -1L
              walk(tkFrom, tkTo) {
                case ("tkhd", f, t) =>
                  if ((payload(f) & 0xff) != 0) fail("only tkhd version 0 supported")
                  if (t - f < 84) fail("tkhd box too small")
                  w = (u32(f + 76) >> 16).toInt // 16.16 fixed
                  h = (u32(f + 80) >> 16).toInt
                case ("mdia", mdFrom, mdTo) =>
                  walk(mdFrom, mdTo) {
                    case ("hdlr", f, _) =>
                      isVide = typ(f + 8) == "vide"
                    case ("minf", mnFrom, mnTo) =>
                      walk(mnFrom, mnTo) {
                        case ("stbl", sbFrom, sbTo) =>
                          walk(sbFrom, sbTo) {
                            case ("stts", f, t) =>
                              val entries = u32(f + 4)
                              if (t - f < 8 + entries * 8) fail("truncated stts")
                              var s = 0L
                              var e = 0
                              while (e < entries) { s += u32(f + 8 + e * 8); e += 1 }
                              frames = s
                            case _ => ()
                          }
                        case _ => ()
                      }
                    case _ => ()
                  }
                case _ => ()
              }
              if (isVide && sttsFrames < 0) {
                if (frames < 0) fail("video trak carries no stts")
                sttsFrames = frames; vidW = w; vidH = h
              }
            case _ => ()
          }
        case ("mdat", f, t) =>
          if (mdatFrom < 0) { mdatFrom = f; mdatTo = t }
        case _ => ()
      }
      if (timescale <= 0 || durationTk < 0) fail("no moov/mvhd in payload")
      if (sttsFrames < 0) fail("no video trak in payload")
      if (mdatFrom < 0) fail("no mdat in payload")
      if (sttsFrames > Int.MaxValue) fail("stts sample count overflows")
      val n     = mdatTo - mdatFrom
      val feats = new Array[Float](bands)
      var b = 0
      while (b < bands) {
        val from = (b.toLong * n / bands).toInt
        val to   = ((b + 1).toLong * n / bands).toInt
        var s = 0L
        var i = from
        while (i < to) { s += (payload(mdatFrom + i) & 0xff); i += 1 }
        feats(b) = if (to > from) (s.toDouble / (to - from)).toFloat else 0f
        b += 1
      }
      MediaFeatures(
        mediaId,
        "video",
        width = vidW,
        height = vidH,
        nFrames = sttsFrames.toInt,
        features = feats)
    }
  }

  /** REAL external-decoder codec: pipes the payload through an `ffmpeg`
    * subprocess and extracts features from genuinely DECODED samples —
    * gray pixels for image/video (rawvideo, normalized to a fixed
    * `rasterW`×`rasterH` grid so the stream layout is known without an
    * ffprobe pre-pass), signed 16-bit mono PCM for audio. This is the
    * production swap-in the [[Codec]] trait was designed for: the
    * pure-JVM codecs above decode what the JRE can ([[PpmCodec]] pixels,
    * [[ImageIoCodec]] PNG/BMP/GIF, [[WavCodec]] PCM) and PARSE the rest
    * ([[Mp3Codec]]/[[Mp4Codec]] containers); ffmpeg closes the gap to
    * real compressed A/V. Nothing else in the pipeline changes.
    *
    * Subprocess discipline (the part that matters at scale): one process
    * per payload (ffmpeg decodes one input per invocation; the codec
    * object itself is per-partition as the trait requires), stdin fed
    * from a dedicated writer thread and stdout drained CONCURRENTLY on
    * the task thread — the only deadlock-free shape for a pipe with
    * back-pressure on both ends; stderr drained to a bounded tail buffer
    * surfaced on failure; video frames are FOLDED into first-frame band
    * sums + a byte count as they stream (memory is raster-bounded, never
    * duration-bounded); a WATCHDOG thread destroyForcibly's the process
    * at `timeoutSec` — armed from the side so even a decoder wedged with
    * stdout still open (which a post-drain wait could never catch, the
    * drain itself being blocked) gets killed and its pipe-break surfaces
    * as the timeout failure; nonzero exit fails loudly with the stderr tail
    * (quarantine, don't fabricate). Feature arithmetic mirrors
    * [[PpmCodec]]/[[WavCodec]]: `bands` equal scan-order slices, integer
    * sums, one double division each.
    *
    * Availability: [[FfmpegCodec.available]] probes the binary once per
    * JVM; construction in an ffmpeg-less container is fine (detection is
    * lazy), decode without the binary fails loudly. The integration spec
    * is gated on availability, so it runs wherever ffmpeg exists and
    * cancels (never silently passes) where it doesn't. */
  final class FfmpegCodec(
      bands: Int = 8,
      rasterW: Int = 64,
      rasterH: Int = 64,
      sampleRateHz: Int = 16000,
      timeoutSec: Long = 60,
      ffmpegBin: String = "ffmpeg") extends Codec {
    require(bands > 0 && rasterW > 0 && rasterH > 0 && sampleRateHz > 0 && timeoutSec > 0,
      "bands, raster dims, sample rate and timeout must be positive")

    override def decode(mediaId: Long, kind: String, payload: Array[Byte]): MediaFeatures = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"FfmpegCodec: $msg (media_id=$mediaId)")
      val audio = kind == "audio"
      val args =
        if (audio)
          Seq(ffmpegBin, "-hide_banner", "-loglevel", "error", "-i", "pipe:0",
            "-f", "s16le", "-ac", "1", "-ar", sampleRateHz.toString, "pipe:1")
        else
          Seq(ffmpegBin, "-hide_banner", "-loglevel", "error", "-i", "pipe:0",
            "-vf", s"scale=$rasterW:$rasterH", "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1")
      val proc =
        try new ProcessBuilder(args: _*).start()
        catch { case e: java.io.IOException => fail(s"cannot launch '$ffmpegBin': ${e.getMessage}") }

      val stderrTail = new java.lang.StringBuilder
      val errThread = new Thread(() => {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getErrorStream))
        try {
          var line = r.readLine()
          while (line != null) {
            stderrTail.synchronized {
              if (stderrTail.length > 4096) stderrTail.delete(0, stderrTail.length - 2048)
              stderrTail.append(line).append('\n')
            }
            line = r.readLine()
          }
        } catch { case _: java.io.IOException => () } // process died; exit code tells the story
      })
      errThread.setDaemon(true)
      errThread.start()
      val inThread = new Thread(() => {
        try { proc.getOutputStream.write(payload); proc.getOutputStream.close() }
        catch { case _: java.io.IOException => () } // ffmpeg closed stdin early (e.g. on error)
      })
      inThread.setDaemon(true)
      inThread.start()

      // watchdog: a decoder wedged WITH STDOUT STILL OPEN would block the
      // drain loop below forever — a post-drain waitFor(timeout) can never
      // fire for it. Arm the kill from a side thread instead: destroying
      // the process EOFs/breaks the stdout pipe, which unblocks the drain,
      // and the flag tells the failure path apart from a clean exit.
      val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
      val watchdog = new Thread(() => {
        if (!proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
          timedOut.set(true)
          // kill DESCENDANTS FIRST: a wrapper-script decoder's child
          // inherits the stdout fd, and killing only the direct process
          // would leave the pipe open (and the drain blocked) until the
          // child exits on its own
          proc.descendants().forEach(h => { h.destroyForcibly(); () })
          proc.destroyForcibly()
        }
      })
      watchdog.setDaemon(true)
      watchdog.start()

      // drain stdout on THIS thread, folding as we read
      val frameBytes = rasterW * rasterH
      val sums       = new Array[Long](bands)
      val counts     = new Array[Long](bands)
      val firstFrame = if (audio) null else new Array[Byte](frameBytes)
      var total      = 0L
      var carry      = 0 // odd-byte carry for 16-bit audio samples
      var carryByte  = 0
      val buf        = new Array[Byte](65536)
      val out        = proc.getInputStream
      var read =
        try out.read(buf)
        catch {
          case e: java.io.IOException =>
            if (timedOut.get()) fail(s"decoder exceeded ${timeoutSec}s, killed") else throw e
        }
      while (read >= 0) {
        var i = 0
        if (audio) {
          // contiguous banding (WavCodec's) needs the total sample count up
          // front, which a stream doesn't have; round-robin striping
          // (sample k → band k mod bands) folds in O(1) memory as samples
          // arrive and is an equally deterministic scan-order partition
          while (i < read) {
            if (carry == 1) {
              val s = ((buf(i) << 8) | carryByte).toShort.toInt // little-endian pair
              val b = ((total / 2) % bands).toInt               // round-robin stripe banding
              sums(b) += s; counts(b) += 1
              carry = 0; total += 2; i += 1
            } else if (i + 1 < read) {
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toInt
              val b = ((total / 2) % bands).toInt
              sums(b) += s; counts(b) += 1
              total += 2; i += 2
            } else { carryByte = buf(i) & 0xff; carry = 1; i += 1 }
          }
        } else {
          while (i < read) {
            if (total < frameBytes) firstFrame((total % frameBytes).toInt) = buf(i)
            total += 1; i += 1
          }
        }
        read =
          try out.read(buf)
          catch {
            case e: java.io.IOException =>
              if (timedOut.get()) fail(s"decoder exceeded ${timeoutSec}s, killed") else throw e
          }
      }
      proc.waitFor() // already exited (EOF) or just killed by the watchdog
      if (timedOut.get()) fail(s"decoder exceeded ${timeoutSec}s, killed")
      if (proc.exitValue() != 0)
        fail(s"ffmpeg exit ${proc.exitValue()}: ${stderrTail.synchronized(stderrTail.toString.trim)}")
      if (total == 0) fail("decoder produced no samples")

      if (audio) {
        val feats = Array.tabulate(bands) { b =>
          if (counts(b) > 0) (sums(b).toDouble / counts(b)).toFloat else 0f
        }
        MediaFeatures(mediaId, "audio",
          width = sampleRateHz, height = 1, nFrames = (total / 2).toInt, features = feats)
      } else {
        if (total % frameBytes != 0)
          fail(s"truncated raster stream: $total bytes for $frameBytes-byte frames")
        val n     = math.min(total, frameBytes.toLong).toInt
        val feats = new Array[Float](bands)
        var b = 0
        while (b < bands) {
          val from = (b.toLong * n / bands).toInt
          val to   = ((b + 1).toLong * n / bands).toInt
          var s = 0L
          var k = from
          while (k < to) { s += (firstFrame(k) & 0xff); k += 1 }
          feats(b) = if (to > from) (s.toDouble / (to - from)).toFloat else 0f
          b += 1
        }
        MediaFeatures(mediaId, if (kind == "video") "video" else "image",
          width = rasterW, height = rasterH, nFrames = (total / frameBytes).toInt, features = feats)
      }
    }
  }

  object FfmpegCodec {
    /** One probe per JVM: can `ffmpeg -version` launch and exit 0? */
    lazy val available: Boolean = detect("ffmpeg")

    private[graft] def detect(bin: String): Boolean =
      try {
        val p = new ProcessBuilder(bin, "-version")
          .redirectErrorStream(true).start()
        p.getOutputStream.close()
        val r = p.getInputStream
        while (r.read() >= 0) () // drain so the process can exit
        p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
      } catch { case _: java.io.IOException => false }
  }

  /** Deterministic synthetic MP4 — the fixture generator for
    * [[Mp4Codec]]'s gate query, same discipline as [[syntheticMp3]]: a
    * well-formed ftyp + moov(mvhd + video trak(tkhd + mdia(mdhd + hdlr +
    * minf(stbl(stts))))) + mdat tree whose metadata fields and mdat bytes
    * are pure integer functions of `id`, so an external oracle computes
    * the expected walk output from the FORMULA while the codec genuinely
    * parses box sizes and nesting. Any walk defect (size arithmetic,
    * nesting, fixed-point dims, stts summing, mdat banding) breaks the
    * comparison. */
  def syntheticMp4(id: Int, nFrames: Int, w: Int, h: Int, mdatBytes: Int): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ payload
    val timescale = 600L
    val duration  = nFrames * 25L // 24 fps at timescale 600
    val mvhd = box(
      "mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ new Array[Byte](8) ++
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000L)) ++ new Array[Byte](24) ++ be32(2))
    val tkhd = box(
      "tkhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(duration) ++
        new Array[Byte](8) ++ new Array[Byte](8) ++
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000L)) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++ be32(0x55c40000L))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes("US-ASCII") ++ new Array[Byte](12) :+ 0.toByte)
    val stts = box("stts", be32(0) ++ be32(1) ++ be32(nFrames.toLong) ++ be32(25))
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++ "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", Array.tabulate[Byte](mdatBytes)(j => (((j * (11 + id)) % 241) & 0xff).toByte))
    ftyp ++ moov ++ mdat
  }

  /** Deterministic synthetic MPEG-1 Layer III stream — the fixture
    * generator for [[Mp3Codec]]'s gate query, same discipline as
    * [[syntheticWav]]: every byte is a pure integer function of
    * (frame, offset, id), so an external oracle computes expected band
    * means and the frame-walk metadata from the FORMULA while the codec
    * genuinely parses sync words and walks frame lengths. Fixed 128 kbps @
    * 44.1 kHz (frame length 417, no padding); mono for even ids, stereo
    * for odd — any walk defect (sync, length arithmetic, mode decode)
    * breaks the comparison. */
  def syntheticMp3(id: Int, nMpegFrames: Int): Array[Byte] = {
    val frameLen = 417 // 144 * 128000 / 44100, padding 0
    val out      = new Array[Byte](nMpegFrames * frameLen)
    var f = 0
    while (f < nMpegFrames) {
      val base = f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(base + 2) = 0x90.toByte // bitrate idx 9 (128k), 44.1 kHz, no padding
      out(base + 3) = (if (id % 2 == 0) 0xc0 else 0x00).toByte // mono / stereo
      var j = 4
      while (j < frameLen) {
        out(base + j) = (((j * (7 + id) + f * 131) % 251) & 0xff).toByte
        j += 1
      }
      f += 1
    }
    out
  }

  /** Deterministic synthetic PCM clip ENCODED AS A REAL WAV — the fixture
    * generator for [[WavCodec]]'s gate query, same discipline as
    * [[syntheticImage]]: sample values are a pure integer function of
    * (frame, channel, id), so an external oracle computes expected band
    * means from the FORMULA while the engine side really writes a RIFF
    * container with `AudioSystem.write` and decodes it back through the
    * codec. Any decode defect (endianness, header skip, channel
    * interleave) breaks the comparison. */
  def syntheticWav(id: Int, sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] = {
    val total = nFrames * channels
    val data  = new Array[Byte](total * 2)
    var k = 0
    while (k < total) {
      val frame = k / channels
      val ch    = k % channels
      val s     = ((frame * (13 + id) + ch * 7919) % 4093) - 2046
      data(2 * k) = (s & 0xff).toByte          // little-endian 16-bit
      data(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data),
      fmt,
      nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE,
      baos)
    baos.toByteArray
  }

  /** Deterministic synthetic RGB test card ENCODED AS A REAL PNG/BMP —
    * the fixture generator for [[ImageIoCodec]]'s gate query: pixel
    * channels are pure integer functions of (x, y, id), so an external
    * oracle can compute the expected band means from the FORMULA while the
    * engine side actually encodes with `ImageIO.write` and decodes through
    * the codec. Any decode defect (channel order, row order, color
    * conversion) breaks the mean comparison. */
  def syntheticImage(id: Int, w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y * 13 + id) % 256
        val g = (x * 11 + y * 3 + 2 * id) % 256
        val bl = (x * 5 + y * 17 + 3 * id) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, format, baos), s"no JDK encoder for $format")
    baos.toByteArray
  }

  /** Ingest a DIRECTORY of media files via Spark's binaryFile source — the
    * real-world entry point (S3/HDFS bucket of images/audio): each file
    * becomes one row (path, modificationTime, length, content), read
    * distributed, never through the driver. Kind is derived from the file
    * extension; media_id from a hash of the path (stable across reruns). */
  def ingestDir(spark: org.apache.spark.sql.SparkSession, dir: String, glob: String = "*"): DataFrame = {
    val raw = spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val kind = when(ext.isin("jpg", "jpeg", "png", "gif", "bmp", "webp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "mkv", "avi", "webm"), "video")
      .otherwise("binary")
    raw.select(
      xxhash64(col("path")).as("media_id"),
      kind.as("kind"),
      col("content").as("payload"),
      col("length").as("n_bytes"),
      md5(col("content")).as("content_hash"))
  }

  /** Normalize any (id, kind, payload) DataFrame to the media schema:
    * (media_id, kind, payload binary, n_bytes, content_hash). */
  def ingest(df: DataFrame, idCol: String, kindCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(kindCol).cast("string").as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("content_hash"))

  /** Decode/feature-extract partition-at-a-time. The codec is constructed
    * once per partition inside the task (broadcast-free: codec factories
    * are cheap lambdas; heavyweight native state initializes lazily on the
    * executor). */
  def decodeFeatures(media: DataFrame, codecFactory: () => Codec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("kind").cast("string"), col("payload").cast("binary"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = codecFactory() // once per partition, not per row
        rows.map { case (id, kind, payload) => codec.decode(id, kind, payload) }
      }
  }

  /** A resized fake "image": fixed tw×th byte grid per row. */
  final case class ResizedImage(mediaId: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Nearest-neighbor resize to a fixed target grid, partition-at-a-time.
    *
    * The decode-to-source-grid step is the stub (payload bytes as a
    * row-major ~square gray image — a real codec supplies true pixels); the
    * resize arithmetic, fixed-size output contract (bounded row width —
    * exactly tw·th bytes regardless of payload size), and batching shape
    * are real. */
  def resizeNearest(media: DataFrame, tw: Int, th: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val n  = math.max(payload.length, 1)
          val sw = math.max(math.sqrt(n.toDouble).toInt, 1)
          val sh = (n + sw - 1) / sw
          val out = new Array[Byte](tw * th)
          var y = 0
          while (y < th) {
            val sy = (y.toLong * sh / th).toInt
            var x  = 0
            while (x < tw) {
              val sx  = (x.toLong * sw / tw).toInt
              val idx = sy * sw + sx
              out(y * tw + x) = if (idx < payload.length) payload(idx) else 0
              x += 1
            }
            y += 1
          }
          ResizedImage(id, tw, th, out)
        }
      }
  }

  /** Uniform frame sampling over a byte payload: `k` evenly-spaced fixed-size
    * slices (a stand-in for video frame extraction with the same batching
    * shape). Declarative substring arithmetic — codegen'd, no UDF. */
  /** dHash perceptual image fingerprint (the difference-hash the image-
    * dedup ecosystem standardized on — Krawetz 2013): resize to a 9×8
    * gray grid with the SAME integer nearest-neighbor arithmetic as
    * [[resizeNearest]], then bit (y,x) = pixel(y,x) < pixel(y,x+1) — 64
    * horizontal-gradient bits packed into a signed long. Gradient signs
    * survive re-encoding/brightness shifts that break exact byte hashes,
    * so hamming distance over dhash IS image near-dup detection — the
    * multimodal sibling of [[Dedup.simhash]], and the SAME banding/
    * pigeonhole machinery applies downstream at corpus scale (a dhash is
    * bit-compatible with the 16-bit-chunk SimHash band join). Source
    * pixels come from the codec-or-stub decode contract: here the stub's
    * row-major ~square gray interpretation, which the oracle replays with
    * pure integer arithmetic. Returns (media_id, dhash). */
  def dhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    resizeNearest(media, tw = 9, th = 8)
      .map { r =>
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val a = r.pixels(y * 9 + x) & 0xff
            val b = r.pixels(y * 9 + x + 1) & 0xff
            if (a < b) h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (r.mediaId, h)
      }
      .toDF("media_id", "dhash")
  }

  /** Walsh–Hadamard perceptual hash — the pHash idea (low-frequency
    * transform coefficients thresholded at their median) with the DCT
    * swapped for the 8×8 Walsh–Hadamard transform, whose ±1 basis keeps
    * every coefficient an EXACT integer (DCT cosines would reopen the
    * cross-engine trig-parity hole the engine refuses everywhere else):
    * coeff(u,v) = Σ p(y,x)·(−1)^{bc(u∧x)+bc(v∧y)} over the 8×8 resample,
    * for the 15 lowest-index AC pairs u,v ∈ [0,4)², bit k = coeff >
    * median(AC) — brightness shifts move only the DC term, so the hash is
    * invariant to them BY CONSTRUCTION (MultimodalSpec pins it), while
    * dhash only survives monotone gradients. Same hamming/banding
    * machinery downstream. Returns (media_id, wht_hash, ac_median). */
  def whtHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    resizeNearest(media, tw = 8, th = 8)
      .map { r =>
        val p = Array.tabulate(64)(i => (r.pixels(i) & 0xff).toLong)
        val coeffs = (for { u <- 0 until 4; v <- 0 until 4; if u != 0 || v != 0 } yield {
          var s = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val neg = (Integer.bitCount(u & x) + Integer.bitCount(v & y)) % 2 == 1
              s += (if (neg) -p(y * 8 + x) else p(y * 8 + x))
              x += 1
            }
            y += 1
          }
          s
        }).toArray
        val med = coeffs.sorted.apply(7) // the 8th smallest of 15
        var h = 0L
        var k = 0
        while (k < 15) { if (coeffs(k) > med) h |= 1L << k; k += 1 }
        (r.mediaId, h, med)
      }
      .toDF("media_id", "wht_hash", "ac_median")
  }

  /** Haitsma-Kalker-style AUDIO perceptual fingerprint — the WAV sibling
    * of [[dhash]]: the channel-summed 16-bit PCM signal is cut into
    * `segments` equal frame ranges, each range's energy is the exact
    * integer Σ|mono(frame)|, and bit s of the fingerprint is set when
    * energy(s+1) > energy(s) — 64 energy-DELTA sign bits in a signed
    * long. Like dHash's gradient signs, the delta signs survive what
    * breaks exact byte hashes: uniform amplitude scaling (volume) leaves
    * every comparison unchanged, and localized noise flips only the bits
    * whose segments it touches — so hamming distance over the fingerprint
    * IS audio near-dup detection, feeding the same SimHash
    * hamming/banding machinery downstream (a fingerprint is a 64-bit
    * SimHash-shaped key).
    *
    * Decode discipline matches [[WavCodec]]: real container parse via
    * javax.sound.sampled on the executor, signed 16-bit PCM only, loud
    * failure on anything malformed. All integer arithmetic — an oracle
    * replays energies and bits from a synthetic clip's sample formula. */
  def audioFingerprint(media: DataFrame, segments: Int = 65): DataFrame = {
    require(segments >= 2 && segments <= 65, s"segments must be in [2,65], got $segments")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (mediaId, payload) =>
        def fail(msg: String): Nothing =
          throw new IllegalArgumentException(s"audioFingerprint: $msg (media_id=$mediaId)")
        val ais =
          try
            javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              fail(s"not a parseable audio container: ${e.getMessage}")
            case e: java.io.IOException => fail(s"decode error: ${e.getMessage}")
          }
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          fail(s"only signed PCM supported, got ${fmt.getEncoding}")
        if (fmt.getSampleSizeInBits != 16)
          fail(s"only 16-bit PCM supported, got ${fmt.getSampleSizeInBits}-bit")
        val channels = fmt.getChannels
        val bytes =
          try ais.readAllBytes()
          catch { case e: java.io.IOException => fail(s"raster read error: ${e.getMessage}") }
        if (bytes.length % (2 * channels) != 0)
          fail(s"truncated PCM payload: ${bytes.length} bytes for $channels channel(s)")
        def sample(k: Int): Int =
          if (fmt.isBigEndian) (bytes(2 * k) << 8) | (bytes(2 * k + 1) & 0xff)
          else (bytes(2 * k + 1) << 8) | (bytes(2 * k) & 0xff)
        val nf = bytes.length / (2 * channels)
        val e  = new Array[Long](segments)
        var s = 0
        while (s < segments) {
          val from = (s.toLong * nf / segments).toInt
          val to   = ((s + 1).toLong * nf / segments).toInt
          var acc = 0L
          var f = from
          while (f < to) {
            var mono = 0L
            var c = 0
            while (c < channels) { mono += sample(f * channels + c); c += 1 }
            acc += math.abs(mono)
            f += 1
          }
          e(s) = acc
          s += 1
        }
        var h = 0L
        var i = 0
        while (i < segments - 1) {
          if (e(i) < e(i + 1)) h |= 1L << i
          i += 1
        }
        (mediaId, h)
      }
      .toDF("media_id", "afp")
  }

  def sampleFrames(media: DataFrame, k: Int, frameBytes: Int): DataFrame = {
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(k - 1))))
      .withColumn(
        "frame",
        expr(s"substring(payload, cast(frame_idx * greatest(n_bytes - $frameBytes, 0) / greatest($k - 1, 1) as int) + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_idx"), col("frame"))
  }
}
