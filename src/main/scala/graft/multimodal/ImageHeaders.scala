package graft.multimodal

/** Pure-JVM image CONTAINER-HEADER parsers for PNG, GIF, JPEG, and
  * WebP — no codec library, because a metadata-extraction pass needs
  * only the public header layout, not pixel decoding:
  *  - PNG (ISO/IEC 15948 §11.2.2): 8-byte signature, then the IHDR
  *    chunk — width/height are the two big-endian int32s at offsets
  *    16/20.
  *  - GIF (GIF87a/89a spec, logical screen descriptor): 6-byte
  *    signature, then width/height as little-endian uint16 at 6/8.
  *  - JPEG (ISO/IEC 10918-1, Annex B): marker-segment walk from SOI to
  *    the first SOFn frame header (C0-CF minus DHT C4 / JPG C8 /
  *    DAC CC), which carries height/width as big-endian uint16 at
  *    payload offsets 3/5.
  * Reference container behavior: bdi-kit has no multimodal surface;
  * this backs graft's own multimodal column suite (SURVEY.md §G).
  */
object ImageHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (width, height, format) from the container header, or None for
    * anything unrecognized, truncated, or malformed — callers map None
    * to an explicit "unknown" row, never an exception (a 100 TB crawl
    * WILL contain garbage bytes).
    */
  def decode(b: Array[Byte]): Option[(Int, Int, String)] =
    if (b == null) None
    else png(b).orElse(gif(b)).orElse(webp(b)).orElse(jpeg(b))

  /** WebP (RIFF container, Google's public container/bitstream specs):
    * "RIFF" + size + "WEBP", then the first chunk decides the layout —
    *  - "VP8 " (lossy): 3-byte frame tag, 0x9d012a start code, then
    *    14-bit little-endian width/height (scale bits masked off);
    *  - "VP8L" (lossless): 0x2f signature byte, then width-1 /
    *    height-1 as two 14-bit fields packed LSB-first;
    *  - "VP8X" (extended): canvas width-1 / height-1 as 24-bit
    *    little-endian at payload offsets 4 / 7.
    */
  private def webp(b: Array[Byte]): Option[(Int, Int, String)] = {
    if (b.length < 30 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F'
        || b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return None
    val tag = new String(b, 12, 4, "US-ASCII")
    val p = 20 // first chunk payload
    val dims = tag match {
      case "VP8 " =>
        // keyframe: frame tag then start code then 16-bit w/h fields,
        // 14 data bits each (upper 2 bits are the rescale hint)
        if (u8(b, p + 3) != 0x9d || u8(b, p + 4) != 0x01 || u8(b, p + 5) != 0x2a)
          None
        else Some((le16(b, p + 6) & 0x3fff, le16(b, p + 8) & 0x3fff))
      case "VP8L" =>
        if (u8(b, p) != 0x2f) None
        else {
          val bits = u8(b, p + 1).toLong | (u8(b, p + 2).toLong << 8) |
            (u8(b, p + 3).toLong << 16) | (u8(b, p + 4).toLong << 24)
          Some((((bits & 0x3fff) + 1).toInt, (((bits >> 14) & 0x3fff) + 1).toInt))
        }
      case "VP8X" =>
        val w = u8(b, p + 4) | (u8(b, p + 5) << 8) | (u8(b, p + 6) << 16)
        val h = u8(b, p + 7) | (u8(b, p + 8) << 8) | (u8(b, p + 9) << 16)
        Some((w + 1, h + 1))
      case _ => None
    }
    dims.collect { case (w, h) if w > 0 && h > 0 => (w, h, "webp") }
  }

  private def png(b: Array[Byte]): Option[(Int, Int, String)] =
    if (b.length >= 24 && b.startsWith(PngSig)
        && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val (w, h) = (be32(b, 16), be32(b, 20))
      // spec caps dimensions at 2^31-1; 0 or over-range means corrupt
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some((w.toInt, h.toInt, "png"))
      else None
    } else None

  private def gif(b: Array[Byte]): Option[(Int, Int, String)] =
    if (b.length >= 13
        && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
        && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val (w, h) = (le16(b, 6), le16(b, 8))
      if (w > 0 && h > 0) Some((w, h, "gif")) else None
    } else None

  private def jpeg(b: Array[Byte]): Option[(Int, Int, String)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced marker stream
      val marker = u8(b, i + 1)
      if (marker == 0xff) { i += 1 } // fill bytes before a marker
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        i += 2 // standalone markers carry no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan reached without a frame header
      } else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        if (marker >= 0xc0 && marker <= 0xcf
            && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (len < 7) return None
          val (h, w) = (be16(b, i + 5), be16(b, i + 7))
          return if (w > 0 && h > 0) Some((w, h, "jpeg")) else None
        }
        i += 2 + len
      }
    }
    None
  }
}
