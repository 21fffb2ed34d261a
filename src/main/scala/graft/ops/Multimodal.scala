package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.F): media payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run per-partition over batches of payload bytes.
  *
  * Image decode is REAL: `javax.imageio` ships with the JDK, so
  * PNG/JPEG/BMP/GIF payloads decode on the executors into
  * width/height/channel-stat/luma-histogram features. Audio decode is
  * REAL for RIFF/WAVE PCM: the header+samples parse needs no library
  * (see [[decodeWav]]). Video decode is REAL for MJPEG-in-AVI — the
  * dominant no-codec container: a RIFF chunk walk yields geometry/fps
  * from `avih` and per-frame JPEG bytes from `movi`, each frame
  * decodable by the same `javax.imageio` path (see [[decodeAvi]]).
  * Payloads with no decoder here (non-PCM audio, non-MJPEG video)
  * fall back to `hashFeatures`, a clearly-marked deterministic
  * stand-in — the seam a JNI/FFmpeg decoder would plug into without
  * touching the Spark-side plumbing.
  */
object Multimodal {

  /** Typed payload row: what a media table looks like at 100 TB —
    * metadata columns prunable without touching the (huge) payload. */
  case class Payload(doc_id: Long, payload: Array[Byte])
  case class MediaFeature(doc_id: Long, kind: String, n_bytes: Long,
    features: Array[Float])

  /** q41: typed metadata extraction over a binary column — byte length,
    * leading magic bytes, kind classification, portable content hash —
    * all codegen'd column expressions; the payload is never
    * deserialized on the driver. Fully oracle-checked (the hash is
    * [[Exact.portableHash]], i.e. md5 — engine-identical over the same
    * bytes); MultimodalSpec additionally pins semantics. */
  def q41MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic"),
        // magic-based kind sniffing, the shape real pipelines use
        // (here over text payloads, so `kind` is mostly "bin")
        when(hex(substring(col("payload"), 1, 3)) === "FFD8FF", "jpeg")
          .when(hex(substring(col("payload"), 1, 4)) === "89504E47", "png")
          .when(substring(col("payload"), 1, 4).cast("string") === "RIFF" &&
            substring(col("payload"), 9, 4).cast("string") === "AVI ", "avi")
          .when(substring(col("payload"), 1, 4).cast("string") === "RIFF", "wav")
          .otherwise("bin").as("kind"),
        Exact.portableHash(col("payload"), 15).as("content_hash"))
      .orderBy(col("doc_id"))

  /** DuckDB 1.0 can't slice BLOBs, so the oracle slices the VARCHAR
    * then encodes — byte-identical to Spark's binary slice while the
    * corpus is ASCII (it is: octet_length = length for every doc at
    * every SF; a multibyte corpus would need a blob-slice UDF here,
    * not an operator change). */
  val oracles: Map[String, String] = Map(
    "q41_multimodal_meta" ->
      s"""SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | upper(hex(encode(substring(text, 1, 4)))) AS magic,
        | CASE WHEN upper(hex(encode(substring(text, 1, 3)))) = 'FFD8FF' THEN 'jpeg'
        |      WHEN upper(hex(encode(substring(text, 1, 4)))) = '89504E47' THEN 'png'
        |      WHEN substring(text, 1, 4) = 'RIFF' AND substring(text, 9, 4) = 'AVI ' THEN 'avi'
        |      WHEN substring(text, 1, 4) = 'RIFF' THEN 'wav'
        |      ELSE 'bin' END AS kind,
        | ${Exact.sql.portableHash("text", 15)} AS content_hash
        |FROM documents ORDER BY 1""".stripMargin
  )

  /** Magic-byte kind sniff — the same classification q41 does in SQL,
    * for the imperative decode path. */
  private[graft] def sniffKind(p: Array[Byte]): String =
    if (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 &&
        (p(2) & 0xFF) == 0xFF) "jpeg"
    else if (p.length >= 4 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' &&
        p(2) == 'N' && p(3) == 'G') "png"
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') "bmp"
    else if (p.length >= 4 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8') "gif"
    else if (p.length >= 4 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F') {
      // RIFF is a container family — the form type at offset 8 picks
      // the media kind (WAVE audio vs AVI video)
      if (p.length >= 12 && p(8) == 'A' && p(9) == 'V' && p(10) == 'I' &&
          p(11) == ' ') "avi"
      else "wav"
    }
    // Netpbm (P5 gray / P6 color) — a format the JDK's imageio does NOT
    // ship a reader for: the kind exists so a third-party PayloadDecoder
    // can claim it through the registry (exercised end-to-end by the
    // test-scope PPM decoder in StreamingSpec); with no decoder
    // registered it takes the loud "pnm-raw" hash fallback like any
    // other unclaimed kind. The magic requires 'P','5'|'6' AND a
    // whitespace third byte, so ordinary text ("P6 is…" matches — real
    // prose starting exactly that way is as unlikely as fake RIFF).
    else if (p.length >= 3 && p(0) == 'P' && (p(1) == '5' || p(1) == '6') &&
        (p(2) == ' ' || p(2) == '\n' || p(2) == '\t' || p(2) == '\r')) "pnm"
    else "bin"

  /** REAL image decode via the JDK's javax.imageio (PNG/JPEG/BMP/GIF —
    * no external codec libraries needed). Emits a fixed 16-wide feature
    * vector: [width, height, aspect, meanR, meanG, meanB, lumaMean,
    * lumaStd, 8-bin luma histogram]. Pixels are sampled on a ≤64×64
    * grid so a pathological 100-megapixel payload costs the same as a
    * thumbnail — per-row work is bounded regardless of input. Returns
    * None when no JDK reader accepts the bytes (caller falls back to
    * [[hashFeatures]]). */
  private[graft] def decodeImage(payload: Array[Byte]): Option[Array[Float]] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val gx = math.min(w, 64); val gy = math.min(h, 64)
          var sr = 0.0; var sg = 0.0; var sb = 0.0
          var sl = 0.0; var sl2 = 0.0
          val hist = new Array[Long](8)
          var iy = 0
          while (iy < gy) {
            val y = iy * h / gy
            var ix = 0
            while (ix < gx) {
              val x = ix * w / gx
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              sr += r; sg += g; sb += b
              sl += luma; sl2 += luma * luma
              hist((luma / 32.0).toInt.min(7)) += 1
              ix += 1
            }
            iy += 1
          }
          val n = (gx * gy).toDouble
          val lumaMean = sl / n
          val lumaVar = math.max(sl2 / n - lumaMean * lumaMean, 0.0)
          val out = new Array[Float](16)
          out(0) = w.toFloat; out(1) = h.toFloat
          out(2) = (w.toDouble / h).toFloat
          out(3) = (sr / n).toFloat; out(4) = (sg / n).toFloat; out(5) = (sb / n).toFloat
          out(6) = lumaMean.toFloat; out(7) = math.sqrt(lumaVar).toFloat
          var d = 0
          while (d < 8) { out(8 + d) = (hist(d) / n).toFloat; d += 1 }
          Some(out)
        }
      }
    } catch { case _: Exception => None }
  }

  /** REAL audio decode for RIFF/WAVE PCM — a WAV file is a RIFF header
    * plus chunks, parseable with no library at all: the "fmt " chunk
    * carries sample rate / channel count / bit depth, the "data" chunk
    * the PCM samples (8-bit unsigned or 16-bit signed LE). Emits the
    * fixed 16-wide vector [sampleRate, channels, bitsPerSample, frames,
    * durationSec, rms, peak, meanAbs, 8-bin |amplitude| histogram],
    * amplitudes normalized to [-1, 1]. Samples are read on a bounded
    * stride grid (≤ 65536 points) — the same per-row cost bound as
    * [[decodeImage]]'s 64×64 grid, so an hour-long payload costs the
    * same as a clip. Returns None for non-PCM encodings or malformed
    * chunks (caller falls back to [[hashFeatures]]). */
  private[graft] def decodeWav(payload: Array[Byte]): Option[Array[Float]] = {
    try {
      def ascii(o: Int) = new String(payload, o, 4, "US-ASCII")
      def u16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
      def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
      if (payload.length < 44 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        return None
      var off = 12L
      var audioFmt = -1; var channels = 0; var rate = 0L; var bits = 0
      var dataOff = -1; var dataLen = 0L
      while (off + 8 <= payload.length && (audioFmt < 0 || dataOff < 0)) {
        val id = ascii(off.toInt); val sz = u32(off.toInt + 4)
        if (id == "fmt " && sz >= 16) {
          audioFmt = u16(off.toInt + 8); channels = u16(off.toInt + 10)
          rate = u32(off.toInt + 12); bits = u16(off.toInt + 22)
        } else if (id == "data") { dataOff = off.toInt + 8; dataLen = sz }
        // advance in LONG arithmetic: a malformed size near 2^32 would
        // truncate negative as an Int and stall the walk forever — the
        // one failure mode the surrounding catch cannot see
        off += 8L + sz + (sz & 1L)
      }
      // PCM only (format 1), sane geometry, both required chunks present
      if (audioFmt != 1 || dataOff < 0 || channels <= 0 || rate <= 0 ||
          (bits != 8 && bits != 16)) return None
      val bytesPer = bits / 8
      val avail = math.min(dataLen, (payload.length - dataOff).toLong)
      val nSamples = avail / bytesPer
      if (nSamples <= 0) return None
      // samples are channel-INTERLEAVED: a stride sharing ANY factor
      // with the channel count visits only nSamples/gcd of the channels
      // (channels=4, stride=6 samples channels 0 and 2 forever; a
      // stereo file with signal on the right would read rms ≈ 0) —
      // advance the stride until it is coprime with the channel count
      // so the sweep cycles through every channel
      def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
      var stride = math.max(1L, nSamples / 65536L)
      while (channels > 1 && gcd(stride, channels.toLong) != 1) stride += 1
      var i = 0L; var n = 0L
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
      val hist = new Array[Long](8)
      while (i < nSamples) {
        val o = dataOff + (i * bytesPer).toInt
        val a =
          if (bits == 16) ((payload(o) & 0xFF) | (payload(o + 1) << 8)).toShort / 32768.0
          else ((payload(o) & 0xFF) - 128) / 128.0
        val abs = math.abs(a)
        sumSq += a * a; sumAbs += abs
        if (abs > peak) peak = abs
        hist(math.min((abs * 8).toInt, 7)) += 1
        n += 1; i += stride
      }
      val frames = nSamples / channels
      val out = new Array[Float](16)
      out(0) = rate.toFloat; out(1) = channels.toFloat; out(2) = bits.toFloat
      out(3) = frames.toFloat
      out(4) = (frames.toDouble / rate).toFloat
      out(5) = math.sqrt(sumSq / n).toFloat
      out(6) = peak.toFloat
      out(7) = (sumAbs / n).toFloat
      var d = 0
      while (d < 8) { out(8 + d) = (hist(d).toDouble / n).toFloat; d += 1 }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** REAL video decode for MJPEG-in-AVI — like WAV, an AVI file is RIFF
    * chunks parseable with no library: the `avih` header carries
    * geometry / frame timing, the `movi` list the per-frame payloads,
    * and an MJPEG frame ("00dc" chunk) is a complete JPEG the JDK's
    * imageio already decodes. Emits the fixed 16-wide vector [width,
    * height, fps, totalFrames, durationSec, sampledFrames, lumaMean,
    * motionProxy, 8-bin luma histogram], where lumaMean / histogram
    * average over the decoded sample and motionProxy is the mean
    * |Δ lumaMean| between consecutive sampled frames. At most 8 frames
    * decode per payload (even stride), each through [[decodeImage]]'s
    * ≤64×64 grid — per-row work stays bounded for an hour-long clip.
    * Returns None when the container is malformed, has no video frames,
    * or no frame decodes (e.g. uncompressed "00db" DIBs — the FFmpeg
    * seam); caller falls back to [[hashFeatures]]. */
  private[graft] def decodeAvi(payload: Array[Byte]): Option[Array[Float]] = {
    try {
      def ascii(o: Int) = new String(payload, o, 4, "US-ASCII")
      def u16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
      def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
      if (payload.length < 24 || ascii(0) != "RIFF" || ascii(8) != "AVI ")
        return None
      var usPerFrame = 0L; var totalFrames = 0L; var w = 0L; var h = 0L
      var sawAvih = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // walk the chunk run [from, until); LISTs recurse (hdrl → avih,
      // movi → frame chunks, "rec " → frames grouped for interleaving).
      // The depth cap matters: real AVIs nest ≤3 deep, but a crafted
      // chain of nested LISTs would otherwise recurse payload/12 deep —
      // and StackOverflowError is an Error the catch below can't see
      def walk(from: Long, until: Long, depth: Int): Unit = {
        var off = from
        while (off + 8 <= until) {
          val id = ascii(off.toInt); val sz = u32(off.toInt + 4)
          if (id == "LIST" && sz >= 4 && off + 12 <= until && depth < 8) {
            val listType = ascii(off.toInt + 8)
            if (listType == "hdrl" || listType == "movi" || listType == "rec ")
              walk(off + 12, math.min(off + 8 + sz, until), depth + 1)
          } else if (id == "avih" && sz >= 40) {
            usPerFrame = u32(off.toInt + 8); totalFrames = u32(off.toInt + 24)
            w = u32(off.toInt + 40); h = u32(off.toInt + 44)
            sawAvih = true
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.endsWith("dc") || id.endsWith("db")) && sz > 0 &&
              off + 8 + sz <= until) {
            // any stream's compressed/uncompressed VIDEO chunks ("NNdc"
            // / "NNdb") — pinning stream 00 would silently hash-fall-
            // back on a valid MJPEG whose audio stream is listed first
            // (audio chunks are "NNwb" and never match)
            frames += ((off.toInt + 8, sz.toInt))
          }
          // LONG arithmetic: a malformed size near 2^32 must not
          // truncate negative and stall the walk (same fix as decodeWav)
          off += 8L + sz + (sz & 1L)
        }
      }
      walk(12L, payload.length.toLong, 0)
      if (!sawAvih || frames.isEmpty || w <= 0 || h <= 0) return None
      // decode ≤8 frames on an even stride; skip frames imageio rejects
      val stride = math.max(1, frames.length / 8)
      val decoded = frames.indices.by(stride).take(8).flatMap { i =>
        val (o, sz) = frames(i)
        decodeImage(java.util.Arrays.copyOfRange(payload, o, o + sz))
      }
      if (decoded.isEmpty) return None
      val n = decoded.length
      val lumaMean = decoded.map(_(6).toDouble).sum / n
      val motion =
        if (n < 2) 0.0
        else decoded.sliding(2).map { case Seq(a, b) =>
          math.abs(b(6).toDouble - a(6).toDouble) }.sum / (n - 1)
      val out = new Array[Float](16)
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = if (usPerFrame > 0) (1e6 / usPerFrame).toFloat else 0f
      out(3) = (if (totalFrames > 0) totalFrames else frames.length.toLong).toFloat
      out(4) = (out(3) * usPerFrame / 1e6).toFloat
      out(5) = n.toFloat
      out(6) = lumaMean.toFloat
      out(7) = motion.toFloat
      var d = 0
      while (d < 8) {
        out(8 + d) = (decoded.map(_(8 + d).toDouble).sum / n).toFloat; d += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** FALLBACK for payloads no registered [[PayloadDecoder]] claims
    * (non-MJPEG video, non-PCM audio, unknown): deterministic
    * fixed-width features from a rolling byte hash. This is the one
    * remaining stand-in — registering an FFmpeg-class decoder in the
    * [[extractFeatures]] registry replaces it and nothing else. */
  private[graft] def hashFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic rolling hash over bytes
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      val x = h ^ (d * 0x9E3779B97F4A7C15L)
      val mixed = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
      out(d) = ((mixed >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** A pluggable payload decoder — one entry in the codec seam.
    * `kinds` claims sniffed-kind strings (see [[sniffKind]]); `decode`
    * returns the raw feature vector or None to fall through to the
    * deterministic [[hashFeatures]] fallback. Implementations must be
    * Serializable: they ride the `mapPartitions` closure to executors,
    * so keep them stateless singletons or small value objects. */
  trait PayloadDecoder extends Serializable {
    def kinds: Set[String]
    def decode(payload: Array[Byte]): Option[Array[Float]]
  }

  /** JDK-codec image decode (PNG/JPEG/BMP/GIF via javax.imageio). */
  object ImageDecoder extends PayloadDecoder {
    val kinds: Set[String] = Set("png", "jpeg", "bmp", "gif")
    def decode(payload: Array[Byte]): Option[Array[Float]] = decodeImage(payload)
  }

  /** RIFF/WAVE PCM audio decode. */
  object WavDecoder extends PayloadDecoder {
    val kinds: Set[String] = Set("wav")
    def decode(payload: Array[Byte]): Option[Array[Float]] = decodeWav(payload)
  }

  /** RIFF/AVI MJPEG video decode. */
  object AviDecoder extends PayloadDecoder {
    val kinds: Set[String] = Set("avi")
    def decode(payload: Array[Byte]): Option[Array[Float]] = decodeAvi(payload)
  }

  /** The default registry: every codec this engine decodes with the
    * JDK alone. The FFmpeg seam is now API, not a hardcoded branch —
    * a deployment with real H.264/MP3 codecs extends the chain:
    * `extractFeatures(p, dim, Multimodal.builtinDecoders :+ FfmpegDecoder)`
    * and nothing else changes. First decoder claiming a kind wins. */
  val builtinDecoders: Seq[PayloadDecoder] =
    Seq(ImageDecoder, WavDecoder, AviDecoder)

  /** Partition-local feature extraction: batches stay on executors,
    * output is a fixed-width vector per payload — the Scala analog of a
    * pandas-batch UDF. `mapPartitions` is justified here (SURVEY.md §4):
    * decode is genuinely imperative per-row work, not relational.
    * Each payload is routed to the first registry decoder claiming its
    * sniffed kind ([[builtinDecoders]] by default: real decode for
    * images, WAV/PCM audio and MJPEG-AVI video); kinds no decoder
    * claims — or decoder failures — take the [[hashFeatures]] fallback
    * (kind suffixed "-raw" so downstream can tell decoded features from
    * hashed ones). */
  def extractFeatures(payloads: Dataset[Payload], dim: Int = 16,
      decoders: Seq[PayloadDecoder] = builtinDecoders): Dataset[MediaFeature] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val kind = sniffKind(p.payload)
        val decoded = decoders.find(_.kinds.contains(kind))
          .flatMap(_.decode(p.payload))
        decoded match {
          case Some(f) =>
            MediaFeature(p.doc_id, kind, p.payload.length.toLong,
              if (f.length == dim) f else java.util.Arrays.copyOf(f, dim))
          case None =>
            MediaFeature(p.doc_id, s"$kind-raw", p.payload.length.toLong,
              hashFeatures(p.payload, dim))
        }
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_meta" -> (q41MultimodalMeta _)
  )
}
