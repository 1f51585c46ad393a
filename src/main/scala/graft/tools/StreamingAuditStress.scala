package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Sustained-rate stress for the unified streaming curation audit
 * ([[graft.streaming.StreamingIngest.curationAudit]]) — the round-12
 * verdict's open question: the audit is spec-proven EQUIVALENT on
 * replayed batches, but nothing measured it under load. This drives a
 * `rate`-source stream against a real corpus index at a fixed rows/s for
 * a fixed duration, once per watermark setting, and reports:
 *
 *  - throughput: input vs processed rows/s per trigger (a growing gap =
 *    the pipeline cannot sustain the offered rate);
 *  - state growth: total state-store rows + memory per trigger — the
 *    claim under test is that state is bounded by rate x watermark
 *    horizon (candidate dedup + pending per-doc aggregations), NOT by
 *    stream length;
 *  - end-to-end verdict latency: audit-row emission wall time minus the
 *    row's event ts, per output batch (expected ~= watermark delay +
 *    trigger interval — the price curationAudit's docs advertise for the
 *    one-auditable-stream shape);
 *  - trigger-execution time per batch vs the trigger interval (round 14):
 *    a mean execution time ABOVE the interval means the query is falling
 *    behind at the offered rate — the sustained-rate ceiling signal. The
 *    (trigger interval x shuffle parallelism) sweep maps the frontier a
 *    deployment picks from: longer triggers amortize per-batch fixed cost
 *    (higher ceiling, higher latency); shuffle partitions size the state
 *    exchange (too many = per-batch task overhead dominates at this
 *    corpus scale).
 *
 * Stream content exercises every stage: each row picks one of three
 * variants of a corpus doc — byte-identical (exact-dup path), 8 prepended
 * noise tokens (near-dup band+Jaccard path), or a token-remap
 * (novel-doc path; separator-free prefix so the [a-z0-9]+ tokenizer keeps
 * one token per original token — the r12 fixture lesson). Stream doc_ids
 * sit ABOVE every corpus id, matching the audit's monotonic-id greedy
 * rule. Usage (underscores in durations become spaces):
 *
 *   StreamingAuditStress [rowsPerSec] [runSeconds] [watermark1,watermark2]
 *                        [trigger1,trigger2] [shuffleParts1,shuffleParts2]
 *                        [corpusCopies]
 *
 * Every (watermark x trigger x parts) combination runs as its OWN
 * streaming query (fresh checkpoint, so the state-store partitioning
 * really is the swept value — shuffle partitions are fixed per query at
 * its first batch).
 */
object StreamingAuditStress {
  def main(args: Array[String]): Unit = {
    val rate = if (args.nonEmpty) args(0).toInt else 2000
    val runSec = if (args.length > 1) args(1).toInt else 60
    val watermarks: Seq[String] =
      if (args.length > 2) args(2).split(',').toSeq.map(_.replace('_', ' '))
      else Seq("5 seconds", "30 seconds")
    val triggers: Seq[String] =
      if (args.length > 3) args(3).split(',').toSeq.map(_.replace('_', ' '))
      else Seq("2 seconds")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val partsSweep: Seq[Int] =
      if (args.length > 4) args(4).split(',').toSeq.map(_.toInt)
      else Seq(cpus.toInt)
    // corpus-index scale knob (round 15): union N token-remapped replicas
    // of the documents table into the INDEX (copy c prefixes every token
    // with the separator-free "r${c}x", so replicas are distinct docs to
    // the [a-z0-9]+ tokenizer and the band index genuinely grows N-fold)
    // while the stream variants keep hitting copy 0 — the sweep's
    // task-overhead-vs-data-bound crossover as a function of index size
    val corpusCopies: Int = if (args.length > 5) args(5).toInt else 1
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // streaming plans
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- static fixtures: corpus index + eval screen + variant table ---
    val base = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").filter(col("text").isNotNull)
    // stream doc_ids start at 10,000,000 (below); replica ids stay under
    // copies x 1,000,000 + max(doc_id), far beneath it, preserving the
    // monotonic-id greedy rule
    val indexed =
      if (corpusCopies <= 1) base
      else (0 until corpusCopies).map { c =>
        if (c == 0) base
        else base.select((col("doc_id") + c * 1000000L).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(lit(s"r${c}x"), t))).as("text"))
      }.reduce(_ unionAll _)
    val index = graft.pipeline.Dedup.buildCorpusIndex(indexed)
    val evalDocs = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val screen = graft.pipeline.Curation.evalScreenShingles(base, evalDocs)
    // three content variants per corpus doc, keyed DENSELY by vid so the
    // rate source can pick one with a modulo — dense via row_number, not
    // doc_id*3: any gap in the raw id space (nulls filtered above,
    // 1-based ids) would make `value % nVariants` miss vids and the inner
    // join silently DROP stream rows, under-running the advertised rate.
    // Persisted — this is the static side of a per-trigger
    // stream-static join.
    val seq = base.withColumn("dseq",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("doc_id")).cast("long") - 1)
    val exactV = seq.select((col("dseq") * 3).as("vid"), col("text"))
    val nearV = seq.select((col("dseq") * 3 + 1).as("vid"),
      concat_ws(" ", lit((1 to 8).map(i => s"zq${i}noise").mkString(" ")),
        col("text")).as("text"))
    val novelV = seq.select((col("dseq") * 3 + 2).as("vid"),
      concat_ws(" ", transform(split(col("text"), " "),
        t => concat(lit("nvx"), t))).as("text"))
    val variants = exactV.unionAll(nearV).unionAll(novelV)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVariants = variants.count()
    println(s"[audit-stress] corpus=${base.count()} docs x$corpusCopies in index, " +
      s"$nVariants variants, " +
      s"rate=$rate rows/s, run=${runSec}s, watermarks=${watermarks.mkString(" | ")}")

    for (wm <- watermarks; trigger <- triggers; parts <- partsSweep) {
      val tag = s"$wm|$trigger|p$parts"
      // shuffle partitions are per-QUERY, fixed at its first batch — set
      // before plan construction so the swept value is what the state
      // store actually partitions by
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      // stream ids above every corpus id (greedy smaller-id rule)
      val stream = spark.readStream.format("rate")
        .option("rowsPerSecond", rate).load()
        .select((col("value") + 10000000L).as("doc_id"),
          col("timestamp").as("ts"),
          (col("value") % nVariants).as("vid"))
        .join(variants, "vid")
        .select("doc_id", "ts", "text")
      val audit = graft.streaming.StreamingIngest.curationAudit(
        stream, index, screen, watermarkDelay = wm)
      val outRows = new java.util.concurrent.atomic.AtomicLong()
      val latSum = new java.util.concurrent.atomic.AtomicLong()
      val latMax = new java.util.concurrent.atomic.AtomicLong()
      val q = audit.writeStream
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(trigger))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select(col("ts")).collect()
          val now = System.currentTimeMillis()
          rows.foreach { r =>
            val lat = now - r.getTimestamp(0).getTime
            latSum.addAndGet(lat)
            latMax.accumulateAndGet(lat, Math.max(_, _))
          }
          outRows.addAndGet(rows.length)
          ()
        }
        .start()
      val t0 = System.currentTimeMillis()
      // sample progress while the load runs, then drain one extra horizon
      // so in-flight rows close and the latency numbers include them
      // same loud interval parsing as the trigger below (a wrong horizon
      // only shortens the drain window, but consistency is free)
      val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(wm)) match {
        case iv if iv.months == 0 =>
          iv.days * 86400000L + iv.microseconds / 1000L
        case iv => sys.error(s"unsupported watermark interval: $wm ($iv)")
      }
      val deadline = t0 + runSec * 1000L + horizonMs + 8000L
      var lastBatch = -1L
      // execution-time accounting SKIPS the first two batches (plan
      // compile + state-store open dominate them) so the mean reflects
      // steady state — the ceiling verdict below compares it to the
      // trigger interval
      var execSumMs = 0L
      var execMaxMs = 0L
      var execBatches = 0L
      var procSum = 0.0
      var procBatches = 0L
      while (System.currentTimeMillis() < deadline) {
        Thread.sleep(2000)
        val p = q.lastProgress
        if (p != null && p.batchId != lastBatch) {
          lastBatch = p.batchId
          val st = p.stateOperators
          val stRows = st.map(_.numRowsTotal).sum
          val stMb = st.map(_.memoryUsedBytes).sum / 1e6
          val execMs: Long = Option(p.durationMs)
            .flatMap(d => Option(d.get("triggerExecution")))
            .map(_.longValue()).getOrElse(-1L)
          if (p.batchId >= 2 && execMs >= 0) {
            execSumMs += execMs
            execMaxMs = math.max(execMaxMs, execMs)
            execBatches += 1
          }
          val proc = Option(p.processedRowsPerSecond).getOrElse(0.0)
          if (p.batchId >= 2 && proc > 0) { procSum += proc; procBatches += 1 }
          println(f"[audit-stress][$tag] t=${(System.currentTimeMillis() - t0) / 1000}%3ds " +
            f"batch=${p.batchId}%3d in=${p.numInputRows}%6d " +
            f"inRps=${Option(p.inputRowsPerSecond).getOrElse(0.0)}%9.1f " +
            f"procRps=$proc%9.1f execMs=$execMs%6d " +
            f"stateRows=$stRows%8d stateMB=$stMb%7.1f out=${outRows.get()}%7d")
        }
      }
      q.stop()
      q.awaitTermination(30000)
      val n = outRows.get()
      val avgLat = if (n > 0) latSum.get() / n else -1L
      val avgExec = if (execBatches > 0) execSumMs / execBatches else -1L
      val avgProc = if (procBatches > 0) procSum / procBatches else 0.0
      // parse via Spark's own interval reader (singular "1 second" and
      // plural alike) and FAIL LOUDLY on anything else: a silent 2000 ms
      // fallback would grade the sustained= verdict against the wrong
      // interval
      val triggerMs = org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(trigger)) match {
        case iv if iv.months == 0 =>
          iv.days * 86400000L + iv.microseconds / 1000L
        case iv => sys.error(s"unsupported trigger interval: $trigger ($iv)")
      }
      // sustained = steady-state batches complete inside the trigger
      // interval (the query keeps up with the offered rate); the margin
      // is the headroom a deployment has before latency starts compounding
      val sustained = avgExec >= 0 && avgExec < triggerMs
      println(f"[audit-stress][$tag] SUMMARY rate=$rate rows/s x ${runSec}s: " +
        f"audit rows out=$n, avg verdict latency=${avgLat}ms, max=${latMax.get()}ms, " +
        f"avg procRps=$avgProc%.0f, avg execMs=$avgExec (max $execMaxMs, " +
        f"trigger $triggerMs), sustained=$sustained")
    }
    spark.stop()
  }
}
