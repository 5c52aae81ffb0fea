package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Right-size AQE coalescing for the small local SF: the 64m default
      // advisory collapses a ~3MB shuffle to one partition, serializing
      // every post-shuffle stage. At production scale partitions are far
      // above the advisory and these settings are inert.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Noop sink: materializes every output column (a `count()` action lets
    // the optimizer prune the very projections the query exists to compute).
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Optional comma-separated subset for local iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY=dedup_simhash_pairs,dedup_jaccard
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Warm-up pass: JIT + codegen compile + parquet footer caches, so the
    // measured pass reflects steady-state per-query cost instead of charging
    // JVM start-up to whichever query happens to run first.
    names.foreach { n =>
      try run(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
    }
    // A broken query must not silently make the total LOOK faster: record
    // the elapsed time either way, and name failures in the JSON.
    // n=3 measured passes, per-query MEDIAN: single-pass totals on a
    // shared box swing well beyond the ±20% run-to-run variance
    // BASELINE.md documents, making round-over-round deltas meaningless.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val measured = (1 to passes).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        val ok =
          try { run(SparkEntry.queries(name)(spark, sfDir)); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }
    }
    val results = names.zipWithIndex.map { case (name, i) =>
      val runs = measured.map(_(i))
      val times = runs.map(_._2).sorted
      (name, times(times.length / 2), runs.forall(_._3), runs.map(_._2))
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Raw per-pass times (pass order preserved) so round-over-round deltas
    // can be separated from run-to-run variance without re-running.
    val raw = results.map { case (k, _, _, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // Key order puts the headline total at the END of the line: the
    // driver captures the output TAIL, and with totals-first the growing
    // passTimes map pushed "metric"/"value" out of the captured window in
    // r5 — the artifact must stay self-contained under tail truncation.
    val line = s"""{"passTimes":$raw,"failed":$failed,"passes":$passes,"queries":$qs,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    println(line)
    // The driver captures only the stdout TAIL, which truncates the
    // per-query map once the suite is large (r13 kept 62 of 146 times) —
    // so the FULL line is also written as a file artifact; each round
    // commits a copy (bench/BENCH_LOCAL_r*.json) so round-over-round
    // attribution can diff every query, not the tail that survived.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
