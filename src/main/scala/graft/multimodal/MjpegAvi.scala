package graft.multimodal

/** REAL video frame sampling with zero codec dependencies: MJPEG-in-AVI.
  *
  * An AVI file is RIFF chunk framing — `RIFF('AVI ') { LIST('hdrl'){…},
  * LIST('movi'){ '##db'/'##dc' frame chunks, possibly grouped in
  * LIST('rec '){…} }, 'idx1' }` — and in the MJPEG codec every video
  * frame chunk is a complete standalone JPEG. So frame extraction needs
  * only byte-level RIFF walking (pure JDK) and the sampled frames are
  * decodable by the same `javax.imageio` path [[ImageIODecoder]] already
  * uses. This closes the video lane the container's zero-egress build
  * could not cover with codec jars (JavaCV/ffmpeg); non-MJPEG codecs
  * (H.264 etc.) still need a real decoder behind the same
  * [[Multimodal.FrameSampler]] trait.
  *
  * Beyond-reference operator (the training-data-pipeline multimodal
  * family): sampling n evenly-spaced frames is the standard shape — one
  * row per frame, fan-out bounded by `framesPerDoc`. Container formats:
  * RIFF/AVI per the public Microsoft AVI RIFF specification.
  */
final class MjpegAviFrameSampler extends Multimodal.FrameSampler {

  /** Up to `n` evenly-spaced video frames (JPEG payloads) of an AVI.
    * Total: non-AVI / truncated / frameless payloads yield no frames —
    * absence, not nulls, same contract as an empty payload. */
  override def sample(
      id: Long, bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])] = {
    if (n <= 0) Iterator.empty
    else {
      val frames = MjpegAvi.videoFrameChunks(bytes)
      if (frames.isEmpty) Iterator.empty
      else {
        val m = math.min(n, frames.size)
        (0 until m).iterator.map { i =>
          // floor(i * count / m): first frame always included, stride as
          // even as integer arithmetic allows, identity when m == count
          val (off, len) = frames((i.toLong * frames.size / m).toInt)
          (i, java.util.Arrays.copyOfRange(bytes, off, off + len))
        }
      }
    }
  }
}

/** RIFF/AVI chunk walking. Sizes come from untrusted bytes: all offset
  * arithmetic is in Long, every data extent is clamped to the buffer, and
  * the cursor strictly advances — a hostile header can truncate the walk
  * but never loop it or read out of bounds. */
private[multimodal] object MjpegAvi {

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
      (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24

  private def isFourcc(b: Array[Byte], off: Int, cc: String): Boolean =
    b(off) == cc.charAt(0).toByte && b(off + 1) == cc.charAt(1).toByte &&
      b(off + 2) == cc.charAt(2).toByte && b(off + 3) == cc.charAt(3).toByte

  /** A video frame chunk id is two ASCII stream-number digits + "db"
    * (uncompressed DIB) or "dc" (compressed — the JPEG, under MJPEG). */
  private def isVideoFrameId(b: Array[Byte], off: Int): Boolean = {
    val d0 = b(off); val d1 = b(off + 1)
    d0 >= '0' && d0 <= '9' && d1 >= '0' && d1 <= '9' &&
      b(off + 2) == 'd' && (b(off + 3) == 'b' || b(off + 3) == 'c')
  }

  /** (offset, length) of every video frame chunk's payload, in file
    * order; empty for anything that isn't a well-formed-enough AVI. */
  def videoFrameChunks(b: Array[Byte]): Vector[(Int, Int)] = {
    if (b.length < 12 || !isFourcc(b, 0, "RIFF") || !isFourcc(b, 8, "AVI "))
      return Vector.empty
    val out = Vector.newBuilder[(Int, Int)]
    // LIST('movi') turns frame collection on; nested LIST('rec ') groups
    // inherit it through the flag
    def walk(start: Long, end: Long, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val size = u32(b, p.toInt + 4)
        val dataStart = p + 8
        val dataEnd = math.min(dataStart + size, end) // clamp truncated sizes
        if (isFourcc(b, p.toInt, "LIST") && size >= 4) {
          val movi = isFourcc(b, dataStart.toInt, "movi")
          walk(dataStart + 4, dataEnd, inMovi || movi)
        } else if (inMovi && size > 0 && dataEnd > dataStart &&
            isVideoFrameId(b, p.toInt)) {
          out += ((dataStart.toInt, (dataEnd - dataStart).toInt))
        }
        p = dataStart + size + (size & 1L) // chunks pad to even offsets
      }
    }
    walk(12L, b.length.toLong, inMovi = false)
    out.result()
  }
}
