package graft.expressions

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Exact-byte grouping of byte-range spans inside one buffer — the
  * doc-local aggregation primitive behind [[WordRepStats]] and
  * [[LineRepStats]]. Grouping is decided by EXACT byte comparison (no
  * collision caveat at any probability): a 32-bit xxhash only
  * pre-buckets one primitive `Arrays.sort` of packed `(hash32, index)`
  * longs, and equal-hash runs resolve with `Arrays.equals` over the
  * ranges. O(n log n) with tiny constant, zero allocation per span
  * beyond the two packed arrays.
  */
private[expressions] object SpanGroups {

  /** Calls `f(representativeIdx, count)` once per distinct byte value
    * among the spans `[from(i), until(i))`, `i < n`. */
  def foreachGroup(bytes: Array[Byte], from: Array[Int],
      until: Array[Int], n: Int)(f: (Int, Long) => Unit): Unit = {
    if (n <= 0) return
    // full 64-bit hash kept in a parallel array: runs are bucketed by
    // the top 32 bits (packed with the index for one primitive sort),
    // but group resolution compares h64 BEFORE bytes — so the linear
    // scan over representatives inside a 32-bit-collision run is O(k)
    // long-compares, quadratic byte-compares only on true 64-bit
    // collisions (an adversarial line-rich doc can force 32-bit runs,
    // not 64-bit ones)
    val h64 = new Array[Long](n)
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from(i),
        until(i) - from(i), 42L)
      h64(i) = h
      keys(i) = ((h >>> 32) << 32) | i.toLong
      i += 1
    }
    java.util.Arrays.sort(keys)
    val repIdx = new java.util.ArrayList[Int]()
    val repCnt = new java.util.ArrayList[Long]()
    var r = 0
    while (r < n) {
      val h = keys(r) >>> 32
      var e = r
      repIdx.clear(); repCnt.clear()
      while (e < n && (keys(e) >>> 32) == h) {
        val idx = (keys(e) & 0xFFFFFFFFL).toInt
        var g = 0
        var matched = false
        while (g < repIdx.size && !matched) {
          val ri = repIdx.get(g)
          if (h64(ri) == h64(idx) &&
              until(ri) - from(ri) == until(idx) - from(idx) &&
              java.util.Arrays.equals(bytes, from(idx), until(idx),
                bytes, from(ri), until(ri))) {
            repCnt.set(g, repCnt.get(g) + 1L)
            matched = true
          }
          g += 1
        }
        if (!matched) { repIdx.add(idx); repCnt.add(1L) }
        e += 1
      }
      var g = 0
      while (g < repIdx.size) {
        f(repIdx.get(g), repCnt.get(g))
        g += 1
      }
      r = e
    }
  }

  /** Code points in `bytes[from, until)` (non-continuation bytes). */
  def codePoints(bytes: Array[Byte], from: Int, until: Int): Long = {
    var n = 0L
    var p = from
    while (p < until) {
      if ((bytes(p) & 0xC0) != 0x80) n += 1
      p += 1
    }
    n
  }
}
