package graft.index

/**
 * Mutable bounded top-k buffer: two fixed primitive arrays sorted ascending
 * by (dist, id) — the JVM twin of the reference's per-thread top-32
 * insertion-sorted register buffer (reference engine/kernels.cuh:120-170).
 * Zero allocation per candidate: the common reject case is one comparison
 * against the current worst, and an accepted candidate is a binary search
 * plus an arraycopy shift within the k-sized arrays.
 *
 * Top-k under the total order (dist, id) is set-determined, so insertion
 * order never changes the final contents — safe for partial/merge
 * aggregation in any partitioning.
 *
 * Historical note: the encoder-friendly case-class shape dates from the
 * typed-Aggregator era, when the buffer crossed the partial/final shuffle
 * through ExpressionEncoder serialization. Since RankTopKExec replaced
 * that path, buffers live only inside per-task iterators
 * (TopKScanIterator, RankTopKExec, the co-group scorers) and never
 * serialize — the shape is kept for its plain-arrays performance, not an
 * encoder constraint. [[merge]] likewise has no production caller today
 * (the per-task paths insert candidate-by-candidate); it remains the S5
 * reference semantics, exercised by TopKAggregatorSpec's partition-merge
 * property test.
 */
case class TopKBuf(k: Int, dists: Array[Double], ids: Array[Long], var size: Int) {

  /** (d, id) >= the current worst kept entry (call only when size == k). */
  private def gteWorst(d: Double, id: Long): Boolean = {
    val l = size - 1
    d > dists(l) || (d == dists(l) && id >= ids(l))
  }

  def insert(d: Double, id: Long): TopKBuf = {
    if (d.isNaN) return this // NaN would win every `<` slot; Window sorts it last
    if (size == k && gteWorst(d, id)) return this
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (d < dists(mid) || (d == dists(mid) && id < ids(mid))) hi = mid else lo = mid + 1
    }
    // the search lands AFTER an equal (d, id) entry, so an exact duplicate
    // is always at lo-1: keep one. Top-k is over the candidate SET; a
    // multi-probe self-join scores a pair once per shared list and the
    // copies must not crowd out real neighbors. For every other producer
    // (unique (qid, id) streams) this check never fires.
    if (lo > 0 && dists(lo - 1) == d && ids(lo - 1) == id) return this
    val tail = math.min(size, k - 1) // last slot falls off when full
    System.arraycopy(dists, lo, dists, lo + 1, tail - lo)
    System.arraycopy(ids, lo, ids, lo + 1, tail - lo)
    dists(lo) = d
    ids(lo) = id
    if (size < k) size += 1
    this
  }

  /** Merge another buffer in (S5 k-way merge). `o` is sorted ascending, so
    * the first rejected element ends the loop. */
  def merge(o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.size) {
      if (size == k && gteWorst(o.dists(i), o.ids(i))) return this
      insert(o.dists(i), o.ids(i))
      i += 1
    }
    this
  }

  def toSeq: Seq[(Double, Long)] =
    (0 until size).map(i => (dists(i), ids(i)))
}

object TopKBuf {
  def empty(k: Int): TopKBuf =
    TopKBuf(k, new Array[Double](k), new Array[Long](k), 0)
}
