package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media container codec: WRITERS that synthesize valid
  * uncompressed payloads (BMP images, PCM WAV audio, AVI video headers) and
  * PARSERS that read width/height/duration back out of the raw bytes.
  *
  * The parsers are the REAL decode path `MultimodalOps` runs over the
  * corpus — they walk the actual container headers (BITMAPINFOHEADER, RIFF
  * fmt/data chunks, avih) with bounds checks, and truncated or foreign
  * bytes surface on the error channel instead of crashing the task. The
  * writers stand in for the object-store fetch (no real media in this
  * sandbox); swapping them for real bytes changes nothing downstream
  * because the parsers only ever see `Array[Byte]`.
  *
  * Formats chosen because they are header-parseable with zero codec
  * libraries: BMP (Windows bitmap, fixed 54-byte header), WAV (RIFF PCM),
  * AVI (RIFF with an `avih` main header carrying dwTotalFrames /
  * dwMicroSecPerFrame / dwWidth / dwHeight).
  */
object MediaCodec {

  final case class Decoded(modality: String, width: Int, height: Int, durationMs: Int)

  // ---- deterministic byte noise (pixel/sample filler) ----
  private def fill(buf: ByteBuffer, n: Int, seed0: Long): Unit = {
    var s = seed0
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      buf.put((s >>> 32).toByte)
      i += 1
    }
  }

  // ---- writers ----

  /** 24-bit uncompressed BMP: BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
    * + bottom-up pixel rows padded to 4 bytes.
    */
  def writeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bmp dims must be positive: $width x $height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize)
    buf.putShort(0).putShort(0)
    buf.putInt(54) // pixel data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)
    buf.putShort(1)  // planes
    buf.putShort(24) // bits per pixel
    buf.putInt(0)    // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)
    fill(buf, dataSize, seed)
    buf.array()
  }

  /** Mono 16-bit PCM WAV at 500 Hz → byteRate 1000, so duration_ms ==
    * data-chunk length in bytes (keeps synthetic payloads small while the
    * duration math exercises the real fields). `durationMs` must be even
    * (blockAlign = 2).
    */
  def writeWav(durationMs: Int, seed: Long): Array[Byte] = {
    require(durationMs > 0 && durationMs % 2 == 0, s"wav duration must be positive and even: $durationMs")
    val sampleRate = 500
    val blockAlign = 2
    val byteRate = sampleRate * blockAlign // 1000 → 1 byte per ms
    val dataLen = durationMs
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(byteRate)
    buf.putShort(blockAlign.toShort)
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    fill(buf, dataLen, seed)
    buf.array()
  }

  /** Minimal RIFF-AVI: LIST/hdrl holding the 56-byte `avih` main header
    * (dwMicroSecPerFrame, dwTotalFrames, dwWidth, dwHeight are the fields a
    * decoder needs for duration and dimensions), plus a JUNK chunk of
    * deterministic filler standing in for the movi data.
    */
  def writeAvi(width: Int, height: Int, totalFrames: Int, usPerFrame: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && totalFrames > 0 && usPerFrame > 0,
      s"avi params must be positive: $width x $height, $totalFrames frames @ $usPerFrame us")
    val junkLen = 64
    // RIFF(12) + LIST header(12) + avih chunk header(8) + avih body(56) + JUNK(8 + junkLen)
    val listBody = 4 + 8 + 56 // 'hdrl' + avih chunk
    val riffBody = 4 + 8 + listBody + 8 + junkLen // 'AVI ' + LIST chunk + JUNK chunk
    val buf = ByteBuffer.allocate(8 + riffBody).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(riffBody)
    buf.put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII"))
    buf.putInt(listBody)
    buf.put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII"))
    buf.putInt(56)
    buf.putInt(usPerFrame)
    buf.putInt(0) // dwMaxBytesPerSec
    buf.putInt(0) // dwPaddingGranularity
    buf.putInt(0) // dwFlags
    buf.putInt(totalFrames)
    buf.putInt(0) // dwInitialFrames
    buf.putInt(1) // dwStreams
    buf.putInt(0) // dwSuggestedBufferSize
    buf.putInt(width)
    buf.putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    buf.put("JUNK".getBytes("US-ASCII"))
    buf.putInt(junkLen)
    fill(buf, junkLen, seed)
    buf.array()
  }

  // ---- parsers (the real decode path) ----

  private def le(payload: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)

  private def fourcc(b: ByteBuffer, at: Int): String = {
    val a = new Array[Byte](4)
    var i = 0
    while (i < 4) { a(i) = b.get(at + i); i += 1 }
    new String(a, "US-ASCII")
  }

  /** Dispatch on the container magic and parse the header fields. Any
    * malformed, truncated, or unrecognized byte stream returns Left — the
    * error channel, never an exception (a poison row must not kill a
    * 100 TB task).
    */
  def decode(payload: Array[Byte]): Either[String, Decoded] = {
    if (payload == null || payload.length < 12) return Left("payload shorter than any container header")
    val b = le(payload)
    if (payload(0) == 'B'.toByte && payload(1) == 'M'.toByte) parseBmp(b, payload.length)
    else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WAVE") parseWav(b, payload.length)
    else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") parseAvi(b, payload.length)
    else Left(s"unknown container magic ${payload.take(4).map(x => f"${x & 0xff}%02x").mkString}")
  }

  private def parseBmp(b: ByteBuffer, len: Int): Either[String, Decoded] = {
    if (len < 54) return Left(s"truncated bmp: $len < 54 header bytes")
    val fileSize = b.getInt(2)
    val dataOffset = b.getInt(10)
    val infoSize = b.getInt(14)
    val width = b.getInt(18)
    val height = b.getInt(22) // negative = top-down; magnitude is the pixel height
    val bpp = b.getShort(28).toInt
    if (infoSize < 40) return Left(s"bmp info header too small: $infoSize")
    if (width <= 0 || height == 0) return Left(s"bmp dims invalid: $width x $height")
    if (dataOffset < 54 || dataOffset > len) return Left(s"bmp pixel offset out of range: $dataOffset")
    if (len < fileSize) return Left(s"truncated bmp: $len of $fileSize declared bytes")
    if (bpp != 24 && bpp != 32 && bpp != 8 && bpp != 1) return Left(s"bmp bpp unsupported: $bpp")
    Right(Decoded("image", width, math.abs(height), 0))
  }

  private def parseWav(b: ByteBuffer, len: Int): Either[String, Decoded] = {
    // walk RIFF chunks from offset 12: need fmt (byteRate) then data (length)
    var pos = 12
    var byteRate = 0
    var ok = false
    while (pos + 8 <= len) {
      val id = fourcc(b, pos)
      val sz = b.getInt(pos + 4)
      if (sz < 0) return Left(s"wav chunk '$id' negative size")
      if (id == "fmt ") {
        if (pos + 8 + 16 > len) return Left("truncated wav fmt chunk")
        byteRate = b.getInt(pos + 16)
        if (byteRate <= 0) return Left(s"wav byteRate invalid: $byteRate")
      } else if (id == "data") {
        if (byteRate == 0) return Left("wav data chunk before fmt")
        if (pos + 8 + sz > len) return Left(s"truncated wav: data chunk $sz bytes past end")
        val durationMs = (sz.toLong * 1000L / byteRate).toInt
        return Right(Decoded("audio", 0, 0, durationMs))
      }
      pos += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      ok = true
    }
    if (!ok) Left("wav has no chunks") else Left("wav has no data chunk")
  }

  private def parseAvi(b: ByteBuffer, len: Int): Either[String, Decoded] = {
    // find LIST/hdrl, then the avih chunk inside it
    var pos = 12
    while (pos + 12 <= len) {
      val id = fourcc(b, pos)
      val sz = b.getInt(pos + 4)
      if (sz < 0) return Left(s"avi chunk '$id' negative size")
      if (id == "LIST" && fourcc(b, pos + 8) == "hdrl") {
        var inner = pos + 12
        val listEnd = pos + 8 + sz
        if (listEnd > len) return Left("truncated avi: hdrl LIST past end")
        while (inner + 8 <= listEnd) {
          val cid = fourcc(b, inner)
          val csz = b.getInt(inner + 4)
          if (cid == "avih") {
            if (csz < 40 || inner + 8 + csz > len) return Left(s"truncated avi: avih $csz bytes")
            val usPerFrame = b.getInt(inner + 8)
            val totalFrames = b.getInt(inner + 8 + 16)
            val width = b.getInt(inner + 8 + 32)
            val height = b.getInt(inner + 8 + 36)
            if (width <= 0 || height <= 0) return Left(s"avi dims invalid: $width x $height")
            if (usPerFrame <= 0 || totalFrames < 0) return Left(s"avi timing invalid: $totalFrames @ $usPerFrame us")
            val durationMs = (totalFrames.toLong * usPerFrame / 1000L).toInt
            return Right(Decoded("video", width, height, durationMs))
          }
          inner += 8 + csz + (csz & 1)
        }
        return Left("avi hdrl has no avih header")
      }
      pos += 8 + sz + (sz & 1)
    }
    Left("avi has no hdrl LIST")
  }
}
