package graft.tools

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession

import graft.functions.{PqAdcDistanceCol, PqKernels, VectorKernels}

/**
 * Scratch: quantify the per-query prep memo in
 * [[graft.functions.PqAdcDistanceCol]] (round 18, r17 advice #2). The
 * batch-PQ candidate stage evaluates the expression once per joined
 * (query, code) pair; under a broadcast join the same handful of query
 * vectors arrive row after row. Three modes per metric:
 *
 *  - `hit`:   every call scores the SAME query — the memo path (one
 *             Arrays.equals, no prep allocation).
 *  - `miss`:  two queries ALTERNATE — every call misses the memo and
 *             pays equals + full prep (strictly worse than the pre-memo
 *             code by the failed equals; the adversarial bound).
 *  - `nomemo`: the pre-r18 behavior replayed directly (prepQuery +
 *             checked scoring per call, no memo machinery).
 *
 * Usage: AdcMemoBench [dim] [iters]  (defaults 64, 2000000)
 */
object AdcMemoBench {
  // volatile accumulator the measured sums land in; printed at exit so
  // the JIT cannot prove the scoring loops dead
  @volatile private var blackhole: Double = 0.0

  def main(args: Array[String]): Unit = {
    val dim = if (args.length > 0) args(0).toInt else 64
    val iters = if (args.length > 1) args(1).toInt else 2000000
    val m = 8
    val dsub = dim / m
    val ks = 256
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(42)
    val books = Array.fill(m, ks, dsub)(rnd.nextFloat() * 2 - 1)
    val bc = spark.sparkContext.broadcast(books)
    val q1 = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val q2 = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val codes = Array.fill(64)(new GenericArrayData(
      Array.fill(m)((rnd.nextInt(ks) & 0xff).toByte)))
    // UnsafeArrayData, not Generic: the real candidate stage reads the
    // query from an UnsafeRow (memcpy toFloatArray), and boxed Generic
    // elements would dominate the measurement
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    val (a1, a2) = (UnsafeArrayData.fromPrimitiveArray(q1),
      UnsafeArrayData.fromPrimitiveArray(q2))

    Seq(VectorKernels.METRIC_L2, VectorKernels.METRIC_COSINE).foreach { metric =>
      val mname = if (metric == VectorKernels.METRIC_COSINE) "cosine" else "l2"
      def fresh() = PqAdcDistanceCol(
        Literal(null), Literal(null), bc, metric)
      def time(body: Int => Double): Double = {
        var sum = 0.0
        var i = 0
        while (i < iters / 10) { sum += body(i); i += 1 } // warm JIT
        val t0 = System.nanoTime()
        i = 0
        while (i < iters) { sum += body(i); i += 1 }
        val ns = (System.nanoTime() - t0).toDouble / iters
        // DCE sink AFTER timing (r18 advice: `sum == Double.NaN` is
        // always false — NaN != NaN — so the JIT could drop the work)
        blackhole += sum
        ns
      }
      val eHit = fresh()
      val eMiss = fresh()
      val hit = (i: Int) => eHit.adc(codes(i & 63), a1)
      val miss = (i: Int) =>
        eMiss.adc(codes(i & 63), if ((i & 1) == 0) a1 else a2)
      // the pre-r18 per-pair work PLUS the r18 null-element contract scan
      // (the expression's hit/miss modes pay that scan too — without it
      // here the comparison would charge the scan to the memo)
      val nomemo = (i: Int) => {
        val a = if ((i & 1) == 0) a1 else a2
        val n = a.numElements()
        var j = 0
        var anyNull = false
        while (j < n) { if (a.isNullAt(j)) anyNull = true; j += 1 }
        if (anyNull) Double.MaxValue
        else PqKernels.adcDistanceDirectChecked(
          PqKernels.prepQuery(a.toFloatArray(), metric), books, metric,
          codes(i & 63))
      }
      // 3 interleaved rounds, min-of per mode: order effects and box
      // noise dominate a single pass
      val best = Array(Double.MaxValue, Double.MaxValue, Double.MaxValue)
      (1 to 3).foreach { _ =>
        best(0) = math.min(best(0), time(hit))
        best(1) = math.min(best(1), time(miss))
        best(2) = math.min(best(2), time(nomemo))
      }
      println(f"[adcmemo] $mname%-6s hit=${best(0)}%7.1f miss=${best(1)}%7.1f " +
        f"nomemo=${best(2)}%7.1f ns/op (dim=$dim m=$m ks=$ks)")
    }
    println(s"[adcmemo] blackhole=$blackhole")
    spark.stop()
  }
}
