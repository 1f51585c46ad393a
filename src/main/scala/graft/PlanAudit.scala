package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.VectorDB
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = new VectorDB(spark, java.nio.file.Files.createTempDirectory("audit").toString)
    db.createIndex(IndexConfig("a", dimension = 64, nlist = 16))
    val src = VectorDB.readVectorParquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    val ep = db.buildEpoch("a", src); db.activateEpoch("a", ep)
    val qs = src.limit(4).selectExpr("id as qid", "vec as qvec")
    val res = db.search("a", qs, topk = 5, nprobe = 3)
    res.collect()
    println("==== EXECUTED PLAN ====")
    println(res.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
