package graft.engine

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF87a codec — the fourth image leg of the multimodal
  * decode family (PNG: chunk walk + inflate; JPEG: entropy decode +
  * IDCT, baseline and progressive; GIF: variable-width LZW). All
  * public GIF87a structure: the 6-byte signature, little-endian
  * logical-screen and image descriptors, a global color table, and
  * the GIF flavor of LZW — codes packed LSB-FIRST into 255-byte-max
  * data sub-blocks, a clear code at 2^minCodeSize resetting the
  * dictionary, an end-of-information code, code width growing as the
  * dictionary fills, capped at 12 bits with an explicit clear.
  *
  * The encoder is the fixture half (a GRAYSCALE palette — entry i is
  * (i, i, i) — so an index image IS its pixel image); the decoder is
  * the codec under test: full LZW with dictionary rebuild and the
  * KwKwK self-referencing case, not just the inverse of this
  * encoder's output. GIF is lossless, so the oracle restates pixels
  * in closed form (the Png posture).
  *
  * Untrusted-byte contract (fuzz-pinned, like Jpeg/Png): any input
  * either decodes or throws IllegalArgumentException — every read is
  * bounds-checked, declared dimensions are size-capped before
  * allocation, and LZW codes outside the live dictionary reject. */
object Gif {

  // ------------------------------------------------------------- encode

  /** The GIF 4-pass interlace row schedule: rows 0,8,16,… then
    * 4,12,… then 2,6,… then 1,3,… — sequence position → actual row. */
  private[graft] def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { out(i) = r; i += 1; r += step }
    }
    out
  }

  /** Encode an 8-bit grayscale image as GIF87a with a 256-entry
    * grayscale global color table and real LZW (min code size 8);
    * `interlaced` emits the 4-pass row order with the descriptor flag
    * set — stream framing only, decoded pixels identical. */
  def encodeGray8(width: Int, height: Int,
                  pixel: (Int, Int) => Int,
                  interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "gif: empty image")
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v & 0xff); u8(v >> 8) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16le(width); u16le(height)
    u8(0xf7) // global table, 8-bit color resolution, 256 entries
    u8(0)    // background index
    u8(0)    // aspect
    var i = 0
    while (i < 256) { u8(i); u8(i); u8(i); i += 1 } // grayscale palette
    u8(0x2c) // image descriptor
    u16le(0); u16le(0); u16le(width); u16le(height)
    u8(if (interlaced) 0x40 else 0x00) // no local table; interlace flag
    u8(8)    // LZW min code size
    // --- LZW compress the index stream ---
    val clear = 256
    val eoi = 257
    val data = new ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    var codeWidth = 9
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nBits
      nBits += codeWidth
      while (nBits >= 8) {
        data.write((acc & 0xff).toInt)
        acc >>= 8
        nBits -= 8
      }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = 258
    putCode(clear)
    var cur = -1
    val rowOrder: Array[Int] =
      if (interlaced) interlaceRows(height)
      else Array.tabulate(height)(identity)
    var yi = 0
    while (yi < height) {
      val y = rowOrder(yi)
      var x = 0
      while (x < width) {
        val px = pixel(x, y) & 0xff
        if (cur < 0) cur = px
        else dict.get((cur, px)) match {
          case Some(code) => cur = code
          case None =>
            putCode(cur)
            dict((cur, px)) = next
            next += 1
            // width grows when the NEXT code to assign no longer fits
            if (next == (1 << codeWidth) + 1 && codeWidth < 12)
              codeWidth += 1
            if (next == 4096) { // dictionary full: explicit clear
              putCode(clear)
              dict = scala.collection.mutable.HashMap.empty
              next = 258
              codeWidth = 9
            }
            cur = px
        }
        x += 1
      }
      yi += 1
    }
    if (cur >= 0) putCode(cur)
    putCode(eoi)
    if (nBits > 0) data.write((acc & 0xff).toInt)
    // pack into <=255-byte sub-blocks
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val len = math.min(255, bytes.length - off)
      u8(len)
      out.write(bytes, off, len)
      off += len
    }
    u8(0)    // block terminator
    u8(0x3b) // trailer
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  final case class Decoded(width: Int, height: Int, nSubBlocks: Int,
                           pixels: Array[Byte])

  /** Decode a GIF87a/89a grayscale-palette stream: signature, screen
    * and image descriptors, palette-mapped LZW pixel recovery (the
    * palette's red channel — for the grayscale fixture r = g = b =
    * index). Extensions (0x21, GIF89a) are skipped by their
    * sub-block framing. Interlaced images de-interlace through the
    * 4-pass row schedule; local color tables reject loudly — honest
    * scope. */
  def decodeGray8(bytes: Array[Byte]): Decoded = {
    var pos = 0
    def u8(): Int = {
      require(pos < bytes.length, "gif: truncated")
      val v = bytes(pos) & 0xff
      pos += 1
      v
    }
    def u16le(): Int = { val lo = u8(); lo | (u8() << 8) }
    require(bytes.length >= 6, "gif: too short for signature")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"gif: bad signature")
    pos = 6
    val sw = u16le()
    val sh = u16le()
    val packed = u8()
    u8() // background
    u8() // aspect
    val palette: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val p = new Array[Byte](n)
        var i = 0
        while (i < n) {
          val r = u8(); u8(); u8() // grayscale read-out: red channel
          p(i) = r.toByte
          i += 1
        }
        p
      } else Array.tabulate(256)(_.toByte) // identity fallback
    // skip extensions until the image descriptor
    var b = u8()
    while (b == 0x21) {
      u8() // label
      var len = u8()
      while (len != 0) { // sub-block chain
        require(pos + len <= bytes.length, "gif: extension runs past end")
        pos += len
        len = u8()
      }
      b = u8()
    }
    require(b == 0x2c, f"gif: expected image descriptor, got $b%02X")
    u16le(); u16le() // left, top
    val w = u16le()
    val h = u16le()
    val ipacked = u8()
    require((ipacked & 0x80) == 0, "gif: local color tables unsupported")
    val interlaced = (ipacked & 0x40) != 0
    require(w > 0 && h > 0, "gif: empty image")
    require(w <= sw && h <= sh, "gif: image exceeds logical screen")
    require(w.toLong * h <= (1L << 28),
      s"gif: image too large ($w x $h)") // size cap before allocation
    val minCode = u8()
    require(minCode >= 2 && minCode <= 8, s"gif: LZW min code $minCode")
    // concatenate the data sub-blocks
    val data = new ByteArrayOutputStream()
    var nSub = 0
    var len = u8()
    while (len != 0) {
      require(pos + len <= bytes.length, "gif: data runs past end")
      data.write(bytes, pos, len)
      pos += len
      nSub += 1
      len = u8()
    }
    val lzw = data.toByteArray
    // sequential emission index -> output index (identity unless the
    // 4-pass interlace schedule reorders rows)
    val rowMap: Array[Int] =
      if (interlaced) interlaceRows(h) else null
    // --- LZW decompress ---
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new Array[Byte](w * h)
    var outPos = 0
    def write(b: Byte): Unit = {
      val idx =
        if (rowMap == null) outPos
        else rowMap(outPos / w) * w + (outPos % w)
      out(idx) = b
      outPos += 1
    }
    // dictionary as (prefix link, suffix byte); entries < clear are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var codeWidth = minCode + 1
    var acc = 0L
    var nBits = 0
    var bytePos = 0
    var prev = -1
    val expand = new Array[Byte](4096)
    def emit(code: Int): Int = { // writes the code's string; returns head
      var depth = 0
      var c = code
      while (c >= clear) {
        require(depth < 4096, "gif: corrupt LZW chain")
        expand(depth) = suffix(c)
        depth += 1
        c = prefix(c)
      }
      val head = c
      require(outPos + depth + 1 <= out.length,
        "gif: LZW output exceeds declared dimensions")
      write(palette(c % palette.length))
      var i = depth - 1
      while (i >= 0) {
        write(palette((expand(i) & 0xff) % palette.length))
        i -= 1
      }
      head
    }
    var done = false
    while (!done) {
      while (nBits < codeWidth && bytePos < lzw.length) {
        acc |= (lzw(bytePos) & 0xffL) << nBits
        nBits += 8
        bytePos += 1
      }
      require(nBits >= codeWidth, "gif: LZW stream truncated")
      val code = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>= codeWidth
      nBits -= codeWidth
      if (code == clear) {
        next = eoi + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"gif: first code $code after clear " +
          "is not a literal")
        emit(code)
        prev = code
      } else {
        require(code <= next,
          s"gif: LZW code $code outside live dictionary ($next)")
        val head =
          if (code < next) emit(code)
          else { // KwKwK: code == next, string = prev's string + its head
            val h0 = emit(prev)
            require(outPos < out.length,
              "gif: LZW output exceeds declared dimensions")
            write(palette(h0 % palette.length))
            h0
          }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = head.toByte
          next += 1
          // ONE STEP EARLIER than the encoder's growth check: the
          // decoder's dictionary lags the encoder's by one entry at
          // the moment a code is read (the classic GIF-LZW offset)
          if (next == (1 << codeWidth) && codeWidth < 12)
            codeWidth += 1
        }
        prev = code
      }
      if (outPos == out.length && !done) {
        // all pixels recovered; accept a stream that omits EOI only if
        // nothing but EOI/padding remains
        done = true
      }
    }
    require(outPos == out.length,
      s"gif: LZW produced $outPos of ${out.length} pixels")
    Decoded(w, h, nSub, out)
  }
}
