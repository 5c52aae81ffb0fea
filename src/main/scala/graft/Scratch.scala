package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextAnalysis}

// throwaway profiling main (not part of the library surface)
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, dir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    // 1. raw scan
    time("scan")(docs.count())
    // 2. normalize only
    time("normalize")(docs.select(TextAnalysis.normalize(col("text")).as("x"))
      .agg(sum(length(col("x")))).collect().head.getLong(0))
    // 3. shingles
    time("shingles")(docs.select(Dedup.shingles(col("text"), 2).as("g"))
      .agg(sum(size(col("g")))).collect().head.getLong(0))
    // 4. distinct shingles + explode
    time("explode grams")(docs.select(explode(array_distinct(Dedup.shingles(col("text"), 2))).as("gram"))
      .count())
    // 5. full jaccard pairs
    time("jaccard pairs")(Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.25).count())
    // 6. minhash signature k=4
    time("minhash sig k=4")(Dedup.withMinhashSignature(docs, k = 4)
      .select(col("doc_id"), col("mh0")).count())
    // 7. minhash candidates k=8
    time("minhash cands k=8")(Dedup.minhashCandidates(docs, k = 8, bands = 4).count())
    spark.stop()
  }
}
