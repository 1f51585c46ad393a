package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev diagnostic (round 13): isolate the cost of qualityScore's null
 * guard SHAPE inside the text_analysis projection. Times the full
 * analyze-shaped projection with three quality variants — when()-wrapped
 * blend (the r12 shape), guarded-zero addend (the r13 shape), and no
 * guard at all (the r11 shape, null-broken but the speed baseline) —
 * over the sf docs table. The projection is NOT whole-stage-codegen'd
 * (the fingerprint aggregate() HOF is CodegenFallback and forces the
 * Project out), so subexpression elimination here is
 * GenerateUnsafeProjection's, and this measures what it actually shares.
 */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    docs.count()

    import graft.functions.text
    import graft.pipeline.TextAnalysis
    def blend(textCol: Column): Column = {
      val toks = text.tokenize(textCol)
      val nTok = size(toks).cast("double")
      val nChars = length(textCol).cast("double")
      val alphaChars = length(regexp_replace(lower(textCol), "[^a-z0-9]", "")).cast("double")
      val lenScore = least(nTok / lit(20.0), lit(1.0))
      val alphaRatio = when(nChars > 0, alphaChars / nChars).otherwise(0.0)
      val meanTokLen = when(nTok > 0, alphaChars / nTok).otherwise(0.0)
      val tokLenScore = when(meanTokLen >= 3 && meanTokLen <= 10, lit(1.0)).otherwise(lit(0.5))
      lenScore * lit(0.4) + alphaRatio * lit(0.4) + tokLenScore * lit(0.2)
    }
    val t = col("text")
    val variants: Seq[(String, Column)] = Seq(
      "r11-no-guard" -> blend(t),
      "r12-when-wrap" -> when(t.isNotNull, blend(t)),
      "r13-guarded-zero" -> (blend(t) + when(t.isNotNull, lit(0.0))),
      "current-qualityScore" -> TextAnalysis.qualityScore(t))
    for ((name, q) <- variants; rep <- 1 to 4) {
      val df = docs.select(col("doc_id"),
        text.token_count(t).as("n_tokens"),
        TextAnalysis.langId(t).as("lang_pred"),
        q.as("quality"),
        text.fingerprint(t).as("fingerprint"))
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      if (rep > 1) // rep 1 warms JIT/plan
        println(f"[guard-probe] $name%-22s rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
