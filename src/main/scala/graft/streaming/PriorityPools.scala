package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Priority scheduling for concurrent serving requests — the reference's
 * PriorityRequestQueue semantics (reference server/load_balancer.cpp:
 * 273-329: four priorities LOW/NORMAL/HIGH/URGENT, higher first, FIFO
 * within a priority) re-expressed on Spark's OWN scheduler instead of a
 * hand-rolled queue + thread pool: each priority maps to a FAIR-scheduler
 * pool whose weight doubles per level, so when jobs of different
 * priorities contend for executor slots, an URGENT job receives 8x a LOW
 * job's share — starvation-free (every pool keeps a nonzero weight, unlike
 * a strict priority queue where a flood of URGENT requests starves LOW
 * forever; deliberate hardening, the reference's comparator is strict).
 *
 * Usage: build the session with [[enableConf]] (FAIR mode + the pool file
 * from [[writePoolConfig]]), then wrap each request handler in
 * [[withPool]] — Spark tags every job the body submits with the pool via
 * the `spark.scheduler.pool` thread-local property.
 */
object PriorityPools {

  /** Reference priority levels (load_balancer.cpp:276-281). */
  object Priority extends Enumeration {
    val Low: Priority.Value = Value(0, "low")
    val Normal: Priority.Value = Value(1, "normal")
    val High: Priority.Value = Value(2, "high")
    val Urgent: Priority.Value = Value(3, "urgent")
  }

  /** Pool weight doubles per priority level: 1 / 2 / 4 / 8. */
  def weight(p: Priority.Value): Int = 1 << p.id

  /**
   * Write the FAIR allocation file for the four priority pools and return
   * its path. FIFO within each pool preserves the reference's
   * FIFO-within-priority ordering; minShare stays 0 (weights alone decide
   * contention — a minShare would let an idle priority reserve slots).
   */
  def writePoolConfig(path: java.nio.file.Path): java.nio.file.Path = {
    val pools = Priority.values.toSeq.sortBy(_.id).map { p =>
      s"""  <pool name="${p.toString}">
         |    <schedulingMode>FIFO</schedulingMode>
         |    <weight>${weight(p)}</weight>
         |    <minShare>0</minShare>
         |  </pool>""".stripMargin
    }
    graft.storage.Manifest.atomicWrite(path,
      s"""<?xml version="1.0"?>
         |<allocations>
         |${pools.mkString("\n")}
         |</allocations>
         |""".stripMargin)
    path
  }

  /** Session conf enabling FAIR scheduling against the written pool file.
    * Apply at session build time (`enableConf(p).foldLeft(builder)(...)`)
    * — scheduler mode is fixed once the SparkContext exists. */
  def enableConf(poolFile: java.nio.file.Path): Map[String, String] = Map(
    "spark.scheduler.mode" -> "FAIR",
    "spark.scheduler.allocation.file" -> poolFile.toString)

  /**
   * Run `body` with every Spark job it submits tagged to the priority's
   * pool. The property is a THREAD-local on the submitting thread (this
   * is how Spark scopes pools), so concurrent request handlers on
   * different threads schedule independently; the previous value is
   * restored on exit so nested/pooled callers compose.
   */
  def withPool[T](spark: SparkSession, p: Priority.Value)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", p.toString)
    try body
    finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }
}
