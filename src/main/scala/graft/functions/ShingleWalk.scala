package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.Platform

/** The ONE word-k-shingle walk shared by every shingle kernel
  * ([[MinhashSig]], [[ShingleHashes]], [[ShingleXor64]], [[Md5Kernels]],
  * all at the default k=3; the passage-window kernel at k=8): builds
  * each shingle's `"a b c"` UTF-8 bytes into a reusable growable
  * buffer, no per-shingle allocation, monomorphic call sites (an
  * advance-style cursor rather than a callback so each kernel's hash
  * call stays inlineable — a per-row closure would make the hash site
  * megamorphic across the kernels).
  *
  * Usage: {{{
  * val w = new ShingleWalk(toks)
  * while (w.next()) { hash(w.buf, w.len) }
  * }}}
  * `buf` is only valid until the following `next()`; `buf` may be
  * re-allocated as shingles grow, so callers must re-read it each
  * iteration (not cache it before the loop).
  */
final class ShingleWalk(toks: ArrayData, k: Int = 3) {
  private[this] val n = toks.numElements()
  private[this] var i = 0

  /** Bytes of the current shingle, `[0, len)` valid after `next()`. */
  var buf: Array[Byte] = new Array[Byte](128)

  /** Byte length of the current shingle. */
  var len: Int = 0

  /** Number of shingles this walk yields (0 when fewer than k tokens). */
  def count: Int = if (n < k) 0 else n - k + 1

  /** Advance to the next shingle; false when exhausted. */
  def next(): Boolean = {
    if (i > n - k) return false
    len = 0
    var t = 0
    while (t < k) {
      val s = toks.getUTF8String(i + t)
      val sb = if (s == null) 0 else s.numBytes()
      if (buf.length < len + sb + 1) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + sb + 1))
      }
      if (s != null) {
        s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
        len += sb
      }
      if (t < k - 1) {
        buf(len) = ' '
        len += 1
      }
      t += 1
    }
    i += 1
    true
  }
}
