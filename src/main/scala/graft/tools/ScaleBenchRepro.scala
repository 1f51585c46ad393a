package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.functions.VectorKernels

/**
 * Offline diagnostic for the `vector_scale_bench` entry's run-to-run
 * spread: executes the entry N times in one JVM and prints per-run wall
 * time alongside the Spark stage metrics that distinguish a slow run from
 * a fast one (executor CPU vs run time -> scheduling/IO stalls, JVM GC
 * time, shuffle/spill bytes). Not part of the driver contract.
 */
object ScaleBenchRepro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // accumulate stage metrics between marks
    val lock = new Object
    var stageRun, stageCpu, stageGc, shufRead, shufWrite, spill = 0L
    var tasks = 0
    val stages = scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = lock.synchronized {
        val m = sc.stageInfo.taskMetrics
        stageRun += m.executorRunTime
        stageCpu += m.executorCpuTime / 1000000L
        stageGc += m.jvmGCTime
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        spill += m.memoryBytesSpilled + m.diskBytesSpilled
        tasks += sc.stageInfo.numTasks
        stages += f"    stage ${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%3d " +
          f"cpu=${m.executorCpuTime / 1e9}%6.1fs run=${m.executorRunTime / 1e3}%6.1fs " +
          f"inRec=${m.inputMetrics.recordsRead}%9d shufRec=${m.shuffleWriteMetrics.recordsWritten}%7d " +
          s"[${sc.stageInfo.name.takeWhile(_ != '\n').take(60)}]"
      }
    })
    def snapReset(): (Long, Long, Long, Long, Long, Long, Int, Seq[String]) = lock.synchronized {
      val s = (stageRun, stageCpu, stageGc, shufRead, shufWrite, spill, tasks, stages.toSeq)
      stageRun = 0; stageCpu = 0; stageGc = 0; shufRead = 0; shufWrite = 0; spill = 0; tasks = 0
      stages.clear()
      s
    }

    val fn = graft.SparkEntry.queries("vector_scale_bench")
    fn(spark, sfDir).count() // warm-up: epoch write + plan/codegen
    Thread.sleep(500) // let stage events drain
    snapReset()

    // calibration probe: a fixed FMA loop on its own thread. If IT also
    // slows down during a slow run, the box (hypervisor/thermal) is
    // stealing cycles; if it stays flat, the slowdown is JVM-internal.
    val calA = Array.tabulate(128)(_.toFloat)
    val calB = Array.tabulate(128)(i => (i * 2).toFloat)
    @volatile var calRunning = true
    @volatile var calNsPerOp = 0.0
    val calSamples = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val cal = new Thread(() => {
      var sink = 0.0
      while (calRunning) {
        val t0 = System.nanoTime()
        var r = 0
        while (r < 2000) { sink += VectorKernels.l2(calA, calB); r += 1 }
        val ns = (System.nanoTime() - t0).toDouble / 2000
        calNsPerOp = ns
        calSamples.add(ns)
        Thread.sleep(2)
      }
      // sink.isNaN, not == NaN (always false): the guard must actually
      // reference `sink` observably or the JIT may dead-code-eliminate
      // the whole FMA loop and the calibration measures an empty loop
      if (sink.isNaN) println(sink) // keep the loop alive
    })
    cal.setDaemon(true)
    cal.start()
    Thread.sleep(2000) // let the calibration loop JIT
    var lastCompiles =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    (1 to reps).foreach { i =>
      calSamples.clear()
      val t0 = System.nanoTime()
      // watchdog: on a slow run, dump what Executor task threads are doing
      val watchdog = new Thread(() => {
        try {
          Thread.sleep(2500)
          val traces = Thread.getAllStackTraces.entrySet().iterator()
          while (traces.hasNext) {
            val e = traces.next()
            if (e.getKey.getName.startsWith("Executor task launch")) {
              val frames = e.getValue.take(12).mkString("\n      ")
              println(s"    HOT ${e.getKey.getName}:\n      $frames")
            }
          }
        } catch { case _: InterruptedException => }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      fn(spark, sfDir).count()
      watchdog.interrupt()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val (run, cpu, gc, sr, sw, sp, nt, st) = snapReset()
      import org.apache.spark.metrics.source.CodegenMetrics
      // DELTA per run, not the monotonic total — "did run 5 recompile?"
      // is unanswerable from a cumulative count
      val compilesNow = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val compiles = compilesNow - lastCompiles
      lastCompiles = compilesNow
      import scala.jdk.CollectionConverters._
      val cals = calSamples.asScala.toSeq
      val calStats = if (cals.isEmpty) "n/a"
        else f"${cals.min}%.0f/${cals.sorted.apply(cals.size / 2)}%.0f/${cals.max}%.0f"
      println(f"run=$i%2d wall=$wall%6.2fs taskRun=${run / 1e3}%7.1fs cpu=${cpu / 1e3}%7.1fs " +
        f"gc=${gc / 1e3}%5.1fs spill=${sp >> 20}%4dMB tasks=$nt%4d " +
        f"compiles=$compiles%3d calNs(min/med/max)=$calStats")
    }
    spark.stop()
  }
}
