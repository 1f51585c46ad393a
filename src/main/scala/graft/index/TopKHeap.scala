package graft.index

/**
 * Bounded top-k buffer for LARGE k: a binary max-heap on (dist, id) with
 * lazily-grown primitive arrays. [[TopKBuf]]'s sorted-array insert (the
 * reference's top-32 insertion buffer, engine/kernels.cuh:120-170) is
 * optimal when k is small — the common reject is one comparison — but its
 * per-accept arraycopy shift is O(size), so a rerank-all search
 * (k >= candidate count, used to make the exact-rerank oracle exhaustive)
 * degrades to O(n^2/4) element moves per query. The heap keeps accepts at
 * O(log n) and pays one O(n log n) in-place heapsort at drain.
 *
 * Same keep-set and tie order as TopKBuf: the k smallest (dist, id) pairs,
 * NaN rejected, ties broken by id; [[sortAscending]] leaves the arrays in
 * exactly TopKBuf's emit order — INCLUDING the exact-duplicate skip. A
 * heap cannot find a duplicate in place, so a companion id → dist map
 * mirrors the kept set and is probed only on the ACCEPT path (the common
 * reject stays one comparison against the root). This is what lets the
 * duplicate-producing self-join fast path run at heap-sized k
 * ([[graft.pipeline.Similarity.knnSelfJoin]] — a pair sharing both probed
 * lists scores twice with bit-identical distance). Deliberate limit: the
 * map keys on id alone, so it detects duplicates whose distance matches
 * the kept entry — true for every real producer, where distance is a
 * deterministic function of (qid, id); a producer emitting one id at
 * DIFFERENT distances would keep both in TopKBuf but only the first here
 * (no such producer exists).
 */
final class TopKHeap(val k: Int) {
  private var cap = math.min(k, 32)
  var dists = new Array[Double](cap)
  var ids = new Array[Long](cap)
  var size = 0
  /** id → dist of the current heap contents (duplicate detection).
    * Starts small and rehashes as it fills: pre-sizing by k allocated a
    * k-proportional table even when the producer supplies far fewer
    * candidates (the rerank-preK flood shape — r9 task metrics), and
    * the amortized rehash cost on the fill path is noise next to the
    * per-candidate distance kernel. */
  private val kept = new java.util.HashMap[java.lang.Long, java.lang.Double](32)

  /** (d1, i1) orders strictly after (d2, i2)? */
  @inline private def gt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def insert(d: Double, id: Long): Unit = {
    if (d.isNaN) return // mirror TopKBuf: NaN never ranks
    if (size == k) {
      // full: accept only if strictly better than the worst kept (the root)
      if (!gt(dists(0), ids(0), d, id)) return
      val prev = kept.get(id)
      if (prev != null && prev.doubleValue() == d) return // exact duplicate
      kept.remove(ids(0))
      kept.put(id, d)
      dists(0) = d
      ids(0) = id
      siftDown(0, size)
    } else {
      val prev = kept.get(id)
      if (prev != null && prev.doubleValue() == d) return // exact duplicate
      kept.put(id, d)
      if (size == cap) grow()
      dists(size) = d
      ids(size) = id
      size += 1
      siftUp(size - 1)
    }
  }

  private def grow(): Unit = {
    cap = math.min(k, cap << 1)
    dists = java.util.Arrays.copyOf(dists, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >>> 1
      if (gt(dists(i), ids(i), dists(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(start: Int, end: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      if (l >= end) return
      val r = l + 1
      var m = l
      if (r < end && gt(dists(r), ids(r), dists(l), ids(l))) m = r
      if (gt(dists(m), ids(m), dists(i), ids(i))) { swap(i, m); i = m }
      else return
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val d = dists(a); dists(a) = dists(b); dists(b) = d
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  /** In-place heapsort: after this the arrays are ascending by (dist, id)
    * over [0, size) — TopKBuf's emit order. The heap property is consumed;
    * do not insert afterwards. */
  def sortAscending(): Unit = {
    var m = size
    while (m > 1) {
      m -= 1
      swap(0, m)
      siftDown(0, m)
    }
  }
}
