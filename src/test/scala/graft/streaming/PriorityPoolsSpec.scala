package graft.streaming

import java.util.concurrent.CountDownLatch

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.SparkSpec
import graft.streaming.PriorityPools.Priority

/** Priority-to-FAIR-pool mapping vs the reference PriorityRequestQueue
  * (server/load_balancer.cpp:273-329). */
class PriorityPoolsSpec extends SparkSpec {

  test("pool weights double per priority level (1/2/4/8)") {
    assert(Priority.values.toSeq.map(PriorityPools.weight) === Seq(1, 2, 4, 8))
  }

  test("writePoolConfig emits a valid allocation file with all four pools") {
    val p = java.nio.file.Files.createTempDirectory("graft-pools")
      .resolve("fairscheduler.xml")
    PriorityPools.writePoolConfig(p)
    val xml = scala.xml.XML.loadFile(p.toFile)
    val pools = (xml \ "pool").map(n =>
      ((n \ "@name").text, (n \ "weight").text.toInt, (n \ "schedulingMode").text))
    assert(pools === Seq(
      ("low", 1, "FIFO"), ("normal", 2, "FIFO"),
      ("high", 4, "FIFO"), ("urgent", 8, "FIFO")))
    val conf = PriorityPools.enableConf(p)
    assert(conf("spark.scheduler.mode") === "FAIR")
    assert(conf("spark.scheduler.allocation.file") === p.toString)
  }

  test("withPool tags submitted jobs with the pool and restores the previous value") {
    val sc = spark.sparkContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val done = new CountDownLatch(2)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        seen.add(String.valueOf(j.properties.getProperty("spark.scheduler.pool")))
        done.countDown()
      }
    }
    sc.addSparkListener(listener)
    try {
      sc.setLocalProperty("spark.scheduler.pool", "outer")
      PriorityPools.withPool(spark, Priority.Urgent) {
        spark.range(10).count()
        // nested withPool composes: inner pool applies, then unwinds
        PriorityPools.withPool(spark, Priority.Low) {
          spark.range(10).count()
        }
      }
      // previous value restored after the outer withPool
      assert(sc.getLocalProperty("spark.scheduler.pool") === "outer")
      sc.setLocalProperty("spark.scheduler.pool", null)
      assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS))
      // an action may submit >1 Spark job (AQE stages); poll until both
      // pools surfaced, then check tags in submission order
      val deadline = System.nanoTime() + 10000000000L
      while (!seen.contains("low") && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.toArray.toSeq.distinct === Seq("urgent", "low"))
    } finally sc.removeSparkListener(listener)
  }
}
