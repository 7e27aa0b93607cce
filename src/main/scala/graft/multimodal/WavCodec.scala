package graft.multimodal

/** Pure-JVM WAV (RIFF/PCM) codec: real container parsing + real PCM
  * sample decode, no audio library. WAV's "compression" for PCM is
  * none at all — the container is a chunk walk and the payload is
  * little-endian integers — so unlike JPEG/GIF pixels (entropy
  * decode, genuinely stubbed) the AUDIO modality can be fully real
  * in this environment: the decoder below inverts actual WAV bytes
  * produced by any standard encoder.
  *
  * Same integration shape as [[PngCodec]]: `encode` builds genuine
  * format bytes, `decodeStats` parses them back into exact integer
  * aggregates (no float accumulation anywhere), and anything
  * malformed — bad magic, truncated chunk, non-PCM format, ragged
  * frame — yields None, never an exception or unbounded loop
  * (garbage-safe for untrusted 100 TB corpora).
  *
  * The reference has no audio surface; this is LLM-pipeline
  * capability (brief: multimodal columns with typed metadata).
  */
object WavCodec {

  /** Decoded-audio aggregates. Samples are signed amplitudes
    * (16-bit: as stored; 8-bit: unsigned byte recentred by -128, the
    * WAV convention), summed exactly as integers so cross-engine
    * parity is bit-exact. `durationUs` = floor(frames * 1e6 / rate).
    */
  final case class AudioStats(sampleRate: Int, channels: Int,
                              bitsPerSample: Int, nFrames: Long,
                              nSamples: Long, sumVal: Long, sumSq: Long,
                              peakAbs: Int, durationUs: Long)

  private def le16u(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le16s(b: Array[Byte], i: Int): Int = le16u(b, i).toShort.toInt
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    var k = 0
    while (k < s.length) { if (b(i + k) != s.charAt(k).toByte) return false; k += 1 }
    true
  }

  /** Decode a WAV payload to [[AudioStats]], or None for anything
    * unsupported (non-PCM audioFormat, bit depth not 8/16) or
    * malformed (bad RIFF/WAVE magic, chunk overrunning the payload,
    * missing fmt/data, data length not a whole number of frames).
    * The chunk walk honours RIFF's word alignment (odd-length chunks
    * carry a pad byte) and skips ancillary chunks (LIST, fact, ...)
    * by definition, so real-world encoder output parses.
    */
  def decodeStats(bytes: Array[Byte]): Option[AudioStats] = {
    if (bytes == null || bytes.length < 44) return None
    if (!ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "WAVE")) return None

    var pos = 12
    var audioFormat, channels, sampleRate, bits = -1
    var dataOff = -1
    var dataLen = -1L
    while (pos + 8 <= bytes.length) {
      val len = le32(bytes, pos + 4)
      if (pos + 8 + len > bytes.length) return None
      if (ascii(bytes, pos, "fmt ")) {
        if (len < 16) return None
        audioFormat = le16u(bytes, pos + 8)
        channels = le16u(bytes, pos + 10)
        val sr = le32(bytes, pos + 12)
        if (sr <= 0 || sr > Int.MaxValue) return None
        sampleRate = sr.toInt
        bits = le16u(bytes, pos + 22)
      } else if (ascii(bytes, pos, "data")) {
        dataOff = pos + 8
        dataLen = len
      }
      // RIFF chunks are word-aligned: odd payloads carry a pad byte
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    if (audioFormat < 0 || dataOff < 0) return None
    if (audioFormat != 1 || channels < 1 || channels > 64) return None
    if (bits != 8 && bits != 16) return None
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    if (dataLen % frameBytes != 0) return None

    val nSamples = dataLen / bytesPerSample
    var sum = 0L
    var sumSq = 0L
    var peak = 0
    var i = 0L
    while (i < nSamples) {
      val v =
        if (bits == 16) le16s(bytes, dataOff + (i * 2).toInt)
        else (bytes(dataOff + i.toInt) & 0xff) - 128
      sum += v
      sumSq += v.toLong * v
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      i += 1
    }
    val nFrames = dataLen / frameBytes
    Some(AudioStats(sampleRate, channels, bits, nFrames, nSamples,
      sum, sumSq, peak, nFrames * 1000000L / sampleRate))
  }

  /** Per-segment aggregates over fixed frame windows — the
    * frame-sample shape for audio: segment s covers frames
    * [s·window, min((s+1)·window, nFrames)); the tail may run short.
    * Sample values follow the [[decodeStats]] conventions. Returns
    * None exactly when [[decodeStats]] would.
    */
  final case class SegmentStats(segment: Int, startFrame: Long,
                                nFrames: Long, sumVal: Long, peakAbs: Int)

  def decodeSegments(bytes: Array[Byte], windowFrames: Int): Option[Seq[SegmentStats]] = {
    require(windowFrames >= 1, "windowFrames >= 1")
    // reparse the container via decodeStats' walk by reusing it for
    // validation, then segment-scan the data chunk directly
    val stats = decodeStats(bytes) match {
      case Some(s) => s
      case None => return None
    }
    // locate the data chunk again (decodeStats validated the layout)
    var pos = 12
    var dataOff = -1
    while (pos + 8 <= bytes.length) {
      val len = le32(bytes, pos + 4)
      if (ascii(bytes, pos, "data")) dataOff = pos + 8
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[SegmentStats]
    var seg = 0
    var f = 0L
    while (f < stats.nFrames) {
      val end = math.min(f + windowFrames, stats.nFrames)
      var sum = 0L
      var peak = 0
      var i = f * stats.channels
      val iEnd = end * stats.channels
      while (i < iEnd) {
        val v =
          if (stats.bitsPerSample == 16) le16s(bytes, dataOff + (i * 2).toInt)
          else (bytes(dataOff + i.toInt) & 0xff) - 128
        sum += v
        val a = if (v < 0) -v else v
        if (a > peak) peak = a
        i += 1
      }
      out += SegmentStats(seg, f, end - f, sum, peak)
      seg += 1
      f = end
    }
    Some(out.toSeq)
  }

  /** Proportional time-bin pooling — the audio feature extractor:
    * frame f lands in bin f·nBins/nFrames (integer floor, so every
    * clip maps onto the SAME fixed-length bin grid regardless of its
    * duration), each non-empty bin emitting exact integer frame and
    * sample counts, the signed sample sum, and the absolute-value sum
    * (the energy term an audio fingerprint wants). Returns None
    * exactly when [[decodeStats]] would.
    */
  final case class TimeBin(bin: Int, nFrames: Long, nSamples: Long,
                           sumVal: Long, sumAbs: Long)

  def decodeTimeBins(bytes: Array[Byte], nBins: Int): Option[Seq[TimeBin]] = {
    require(nBins >= 1, "nBins >= 1")
    val stats = decodeStats(bytes) match {
      case Some(s) => s
      case None => return None
    }
    if (stats.nFrames == 0) return Some(Seq.empty)
    var pos = 12
    var dataOff = -1
    while (pos + 8 <= bytes.length) {
      val len = le32(bytes, pos + 4)
      if (ascii(bytes, pos, "data")) dataOff = pos + 8
      pos += 8 + len.toInt + (len.toInt & 1)
    }
    val nf = new Array[Long](nBins)
    val sum = new Array[Long](nBins)
    val sab = new Array[Long](nBins)
    var f = 0L
    while (f < stats.nFrames) {
      val bin = (f * nBins / stats.nFrames).toInt
      nf(bin) += 1
      var i = f * stats.channels
      val iEnd = i + stats.channels
      while (i < iEnd) {
        val v =
          if (stats.bitsPerSample == 16) le16s(bytes, dataOff + (i * 2).toInt)
          else (bytes(dataOff + i.toInt) & 0xff) - 128
        sum(bin) += v
        sab(bin) += (if (v < 0) -v else v)
        i += 1
      }
      f += 1
    }
    Some((0 until nBins).filter(nf(_) > 0).map(b =>
      TimeBin(b, nf(b), nf(b) * stats.channels, sum(b), sab(b))))
  }

  /** Encode real 16-bit PCM WAV bytes (RIFF + fmt + data) with flat
    * interleaved sample s valued `value(s)` (clamped to s16).
    * Frames × channels samples; standard 44-byte header any player
    * or decoder accepts.
    */
  def encode(sampleRate: Int, channels: Int, nFrames: Int,
             value: Long => Int): Array[Byte] = {
    require(sampleRate > 0, "positive sample rate")
    require(channels >= 1 && channels <= 64, "1..64 channels")
    require(nFrames >= 0, "non-negative frame count")
    val nSamples = nFrames.toLong * channels
    require(nSamples * 2 <= 64L * 1024 * 1024, "payload cap 64 MiB")
    val dataLen = (nSamples * 2).toInt
    val out = new Array[Byte](44 + dataLen)
    def w16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def wascii(i: Int, s: String): Unit = {
      var k = 0
      while (k < s.length) { out(i + k) = s.charAt(k).toByte; k += 1 }
    }
    wascii(0, "RIFF"); w32(4, 36L + dataLen); wascii(8, "WAVE")
    wascii(12, "fmt "); w32(16, 16)
    w16(20, 1) // PCM
    w16(22, channels)
    w32(24, sampleRate)
    w32(28, sampleRate.toLong * channels * 2) // byte rate
    w16(32, channels * 2) // block align
    w16(34, 16) // bits per sample
    wascii(36, "data"); w32(40, dataLen)
    var s = 0L
    while (s < nSamples) {
      val v = math.max(-32768, math.min(32767, value(s)))
      w16(44 + (s * 2).toInt, v)
      s += 1
    }
    out
  }
}
