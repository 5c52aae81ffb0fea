package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}
import graft.operators.{Changes, Skew}

/** Scale-path mechanics: salted joins match unsalted semantics and spread
  * hot keys; bucketed tables co-locate their join (no shuffle exchange on
  * either side); the dedup suite's degenerate-input caps bound pair
  * expansion on boilerplate-heavy corpora. */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("minhashCandidates: degenerate bucket capped, no quadratic blowup") {
    // 2000 byte-identical docs (one LSH bucket of 2000 in every band)
    // plus two genuine near-dups. Uncapped, the identical group alone
    // expands to ~2M pairs; the cap must drop that bucket entirely and
    // still find the real pair.
    val boiler = (1 to 2000).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet boilerplate header text"))
    val real = Seq(
      (9001L, "a distinctive document about spark shuffle mechanics"),
      (9002L, "a distinctive document about spark shuffle mechanics"))
    val docs = (boiler ++ real).toDF("doc_id", "text")

    val pairs = Dedup.minhashCandidates(docs, k = 8, bands = 4,
      shingleSize = 2, maxBucket = 64)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((9001L, 9002L)))
    // bounded: nothing from the capped bucket survives
    assert(pairs.forall { case (a, b) => a > 9000L && b > 9000L },
      s"capped bucket leaked pairs: ${pairs.take(5)}")

    // the drop is observable, not silent
    val dropped = Dedup.minhashOversizedBuckets(docs, k = 8, bands = 4,
      shingleSize = 2, maxBucket = 64)
      .select($"n_ids").as[Long].collect()
    assert(dropped.nonEmpty && dropped.forall(_ == 2000L))
  }

  test("ngramJaccardPairs: hot-gram cap prunes boilerplate-only links") {
    // every doc shares the hot bigram "copyright notice"; only 1~2 share
    // real content. With the cap at 5 (< 40 docs), the hot grams drop and
    // only the genuinely-similar pair survives.
    val docs = ((1 to 40).map { i =>
      (i.toLong, "s", s"unique${i}a unique${i}b copyright notice unique${i}c")
    } ++ Seq(
      (101L, "s", "shared content words here copyright notice"),
      (102L, "s", "shared content words here copyright notice")))
      .toDF("doc_id", "source", "text")

    val capped = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.2,
      maxGramDf = 5)
      .as[(Long, Long, Double)].collect()
    assert(capped.map(p => (p._1, p._2)).toSet == Set((101L, 102L)))
    // post-cap sizes: identical docs still score 1.0 over surviving grams
    assert(capped.head._3 == 1.0)

    // uncapped, the hot gram links every doc pair that clears the
    // threshold via boilerplate; the capped plan must emit strictly fewer
    val uncapped = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.2)
      .count()
    assert(uncapped >= capped.length)
  }

  test("simhash 48-bit chunks stay selective on diverse docs") {
    // 12-bit chunks (bits=48, maxDist=3): on 200 docs with disjoint
    // vocabularies the signatures are near-uniform, so no (chunk, value)
    // bucket should collect more than a handful of docs — the property
    // that keeps the pigeonhole self-join sub-quadratic.
    val docs = (1 to 200).map { i =>
      (i.toLong, (0 until 12).map(j => s"v${i}w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val sig = docs.select($"doc_id", Dedup.simhash($"text", 48).as("sh"))
    val maxBucket = (0 until 4).map { c =>
      val lo = c * 12
      sig.select((shiftright($"sh", lo).bitwiseAND(lit(0xFFFL))).as("cv"))
        .groupBy("cv").count()
        .agg(max($"count")).as[Long].head()
    }.max
    assert(maxBucket <= 8L,
      s"12-bit chunk bucket collected $maxBucket of 200 docs")
  }

  test("knnSelfJoin: 10k identical vectors collapse to one class — no " +
    "quadratic candidate expansion") {
    // the duplicate-heavy workload dedup exists for: every copy shares
    // every sign bucket, so the uncollapsed probe join would build ~10^8
    // candidate pairs with a 4-dim dot product each. Class collapse makes
    // it ONE class-level candidate row; member expansion is bounded at
    // k+1 ids per class.
    val dups = (1 to 10000).map(i => (i.toLong, Seq(0.5f, 1f, -2f, 3f)))
      .toDF("vec_id", "embedding")
    val knn = Similarity.knnSelfJoin(dups, k = 3, positions = Seq(1, 2))
      .as[(Long, Long, Double, Long)].collect()
    // every member finds 3 class-mates (k+1 smallest ids minus self)
    assert(knn.length == 30000)
    assert(knn.filter(_._1 == 9999L).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(knn.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(1L, 3L, 4L))
    assert(knn.forall(r => math.abs(r._3 - 1.0) < 1e-12))
  }

  test("cosineNearDupPairsLsh: identical vectors re-expand to exact member " +
    "pairs; distinct vectors still pair across classes") {
    val dups = (1 to 1500).map(i => (i.toLong, Seq(1f, 2f, 3f, 4f)))
    val near = Seq( // bit-distinct near-dups of the dup class direction
      (8001L, Seq(1.0001f, 2f, 3f, 4f)),
      (8002L, Seq(0f, 0f, -1f, -1f))) // far from everything
    val df = (dups ++ near).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairsLsh(df, threshold = 0.9,
      positions = Seq(1, 2))
    // 1500 copies -> C(1500,2) intra pairs + 1500 inter pairs vs 8001
    assert(pairs.count() == 1500L * 1499L / 2 + 1500L)
    val inter = pairs.filter($"id_b" === 8001L)
      .as[(Long, Long, Double)].collect()
    assert(inter.length == 1500 && inter.forall(_._3 >= 0.9))
  }

  test("embedding-LSH hot-bucket cap: distinct same-sign vectors drop " +
    "observably, not quadratically") {
    // 300 DISTINCT vectors sharing one sign pattern — the residual hot
    // bucket exact-dup collapse can't absorb. The cap excludes the whole
    // bucket from candidate generation; the drop is observable.
    val hot = (1 to 300).map(i => (i.toLong, Seq(1f + i * 0.001f, 1f)))
    val cold = Seq((901L, Seq(-1f, -1f)), (902L, Seq(-1.0001f, -1f)))
    val df = (hot ++ cold).toDF("vec_id", "embedding")

    val capped = Similarity.cosineNearDupPairsLsh(df, threshold = 0.9,
      positions = Seq(1, 2), maxBucket = 64)
      .as[(Long, Long, Double)].collect()
    assert(capped.map(p => (p._1, p._2)).toSeq == Seq((901L, 902L)),
      s"capped bucket leaked: ${capped.take(5).toSeq}")
    val knnCapped = Similarity.knnSelfJoin(df, k = 2,
      positions = Seq(1, 2), maxBucket = 64)
      .as[(Long, Long, Double, Long)].collect()
    assert(knnCapped.forall(r => r._1 > 900L && r._2 > 900L),
      s"capped bucket leaked into knn: ${knnCapped.take(5).toSeq}")

    // n_classes (what the cap tests) and n_members (recall exposure)
    val over = Similarity.lshOversizedBuckets(df, maxBucket = 64,
      positions = Seq(1, 2)).as[(Int, Long, Long)].collect().toSeq
    assert(over == Seq((3, 300L, 300L)), s"observed drops: $over")

    // uncapped, the hot bucket pairs quadratically (the behavior the cap
    // exists to bound)
    val uncapped = Similarity.cosineNearDupPairsLsh(df, threshold = 0.9,
      positions = Seq(1, 2), maxBucket = 0).count()
    assert(uncapped == 300L * 299L / 2 + 1)
  }

  test("hot-bucket cap spares exact-duplicate class-mates (intra pairs " +
    "come from the uncapped class frame)") {
    // 300 distinct same-sign vectors overflow the bucket's class cap; 50
    // copies of one more vector share that bucket. The cap drops every
    // INTER-class candidate in the bucket, but the 50-copy class must
    // still pair internally — bit-identical duplicates are the
    // highest-confidence pairs and contribute nothing to the quadratic
    // inter-class work the cap bounds.
    val hot = (1 to 300).map(i => (i.toLong, Seq(1f + i * 0.001f, 1f)))
    val dups = (1001 to 1050).map(i => (i.toLong, Seq(2f, 1f)))
    val df = (hot ++ dups).toDF("vec_id", "embedding")

    val pairs = Similarity.cosineNearDupPairsLsh(df, threshold = 0.9,
      positions = Seq(1, 2), maxBucket = 64)
      .as[(Long, Long, Double)].collect()
    assert(pairs.length == 50 * 49 / 2, s"got ${pairs.length} pairs")
    assert(pairs.forall(p => p._1 >= 1001L && p._2 >= 1001L))

    // knn: every dup member still sees its 2 smallest class-mates as
    // neighbors; the capped singleton classes emit no rows
    val knn = Similarity.knnSelfJoin(df, k = 2,
      positions = Seq(1, 2), maxBucket = 64)
      .as[(Long, Long, Double, Long)].collect()
    assert(knn.length == 100, s"got ${knn.length} knn rows")
    assert(knn.forall(r => r._1 >= 1001L && r._2 >= 1001L))
  }

  test("saltedJoin: inner and left results match the plain join") {
    // key "hot" is 100x skewed
    val skewed = ((1 to 200).map(i => ("hot", i)) ++
      Seq(("a", 1), ("b", 2), ("c", 3), ("orphan", 9)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("d", "D"))
      .toDF("k", "attr")

    val plainInner = skewed.join(dim, Seq("k")).orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val saltedInner = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(saltedInner == plainInner)

    val plainLeft = skewed.join(dim, Seq("k"), "left").orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val saltedLeft = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8, "left")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(saltedLeft == plainLeft)
  }

  test("saltedJoin: single 100%-hot key still joins completely") {
    val skewed = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val dim = Seq(("hot", "H")).toDF("k", "attr")
    assert(Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8).count() == 1000L)
  }

  test("BPE doc-token pricing: the trained vocabulary joins BROADCAST — " +
    "the corpus never shuffles for the probe") {
    import graft.functions.TextAnalysis
    val docs = (1L to 50L).map(i => (i, s"alpha beta gamma doc$i"))
      .toDF("doc_id", "text")
    val (_, encoded) = TextAnalysis.bpeTrain(docs, merges = 2)
    val wordTok = encoded.select(col("word"),
      size(split(col("sym"), "\\|")).cast("long").as("w_tokens"))
    val out = docs
      .select(col("doc_id"),
        explode(TextAnalysis.words(col("text"))).as("word"))
      .join(broadcast(wordTok), Seq("word"))
      .groupBy(col("doc_id")).agg(sum(col("w_tokens")).as("n_bpe_tokens"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab probe must be a broadcast hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the vocab probe:\n$plan")
  }

  test("partitioned layout: a partition-key filter prunes at plan time — " +
    "the scan touches one directory, not the table") {
    val dir = Files.createTempDirectory("graft-partitioned").toFile
      .getAbsolutePath
    val docs = (1 to 300).map(i => (i.toLong, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    docs.write.partitionBy("source").mode("overwrite").parquet(dir)

    val all = spark.read.parquet(dir)
    val pruned = all.filter($"source" === "src1")
    // partition pruning is a directory-level skip: the filter must land
    // in the scan's PartitionFilters BRACKET (an empty bracket plus the
    // value in PushedFilters would mean it degraded to a row-group data
    // filter)...
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters: [")).getOrElse("")
    assert(pf.contains("source") && pf.contains("src1"),
      s"filter did not land as a partition filter:\n$plan")
    // ...and the EXECUTED scan must have read fewer files than the
    // table holds (inputFiles reflects the pre-pruning file index, so
    // only the scan's runtime metric proves the directory skip)
    val totalFiles = all.inputFiles.length
    assert(totalFiles >= 3, "fixture should span 3 directories")
    // execute THIS dataset's plan (count() would build a separate one
    // whose metrics the DF's queryExecution never sees)
    assert(pruned.collect().length == 100)
    val scanFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(scanFiles > 0 && scanFiles <= totalFiles / 3,
      s"pruned scan read $scanFiles of $totalFiles files — no pruning")
  }

  test("applyCdcPartitioned: the merge path directory-skips untouched " +
    "partitions (executed scan numFiles), and matches applyCdc's result") {
    val dir = Files.createTempDirectory("graft-cdc-part").toFile
      .getAbsolutePath
    // dt=1 written as 1 file; dt=2 and dt=3 as 2 files each — 5 total,
    // so a merge path that reads anything beyond dt=1 is detectable
    Seq(1 -> 1, 2 -> 2, 3 -> 2).foreach { case (dt, nFiles) =>
      (1 to 40).map(i => (dt * 100L + i, dt, s"v$i", 10L))
        .toDF("id", "dt", "payload", "ver")
        .repartition(nFiles)
        .write.partitionBy("dt").mode("append").parquet(dir)
    }
    val base = spark.read.parquet(dir)
    // changes touch ONLY dt=1: one upsert, one delete
    val changes = Seq(
      (101L, 1, "updated", 99L, "u"),
      (102L, 1, "gone", 99L, "d"))
      .toDF("id", "dt", "payload", "ver", "op")

    val out = Changes.applyCdcPartitioned(
      base, changes, keyCols = Seq("id"), tsCol = "ver", partitionCol = "dt")
    // execute THIS dataset's plan (the r8 lesson: a separate count()
    // builds a plan whose metrics this queryExecution never sees)
    val rows = out.collect()
    assert(rows.length == 119) // 120 base rows, one deleted
    val byId = rows.map(r => r.getAs[Long]("id") -> r.getAs[String]("payload"))
      .toMap
    assert(byId(101L) == "updated" && !byId.contains(102L))

    // the merge path's scan must have read exactly dt=1's single file;
    // the untouched path reads the other 4 — sum == 5 proves no file
    // was read twice (an unpruned merge would re-read all 5 -> sum 9+).
    // The executed plan is AQE-wrapped (the merge side shuffles), so the
    // file scans hide inside materialized query stages — recurse through
    // them instead of collectLeaves on the outer plan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(out.queryExecution.executedPlan)
      .flatMap(l => l.metrics.get("numFiles").map(m => (l.toString, m.value)))
    assert(scans.map(_._2).sorted == Seq(1L, 4L),
      s"expected scans of (1, 4) files, got ${scans.map(_._2)}")
    // and the 1-file scan skipped at the DIRECTORY level: the touched
    // values landed as a partition filter, not a row-group data filter
    val (mergePlan, _) = scans.minBy(_._2)
    val pf = mergePlan.linesIterator
      .find(_.contains("PartitionFilters: [")).getOrElse("")
    assert(pf.contains("dt"),
      s"touched-partition filter did not land as a partition filter:\n$mergePlan")

    // semantics pin: identical row set to the global applyCdc
    val cols = out.columns.sorted.map(col)
    val full = Changes.applyCdc(
      base, changes, keyCols = Seq("id"), tsCol = "ver")
    assert(out.select(cols: _*).collect().toSet ==
      full.select(cols: _*).collect().toSet)
  }

  test("funnel: per-step state is materialized — the final plan reads " +
    "checkpoint blocks, never re-derives earlier steps from parquet") {
    // Each funnel round consumes the prior state TWICE (strictly-after
    // filter + left join); unmaterialized, Catalyst re-derived the whole
    // step prefix per consumer — a 3-step funnel re-scanned events SEVEN
    // times and re-ran the step-1 aggregation four times (quadratic in
    // step count). With per-round Materialize the returned frame's plan
    // must contain NO parquet scan at all: every step already ran, once,
    // into checkpoint blocks.
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val out = graft.operators.Funnel.funnel(ev,
      steps = Seq("signup", "click", "purchase"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"funnel state not materialized — parquet re-scan in final plan:\n$plan")
    // and the state is real: funnel depths are populated and monotone
    val depths = out.select($"funnel_depth").as[Long].collect()
    assert(depths.nonEmpty && depths.forall(d => d >= 1 && d <= 3))
  }

  test("AQE skew join: the hot key's shuffle partition SPLITS at " +
    "runtime — skew markers in the executed join, answer unchanged") {
    // the runtime complement of Skew.saltedJoin: no rewrite, the
    // engine detects the oversized partition after the map stage and
    // fans it out. Thresholds lowered so a test-sized hot key crosses
    // them; broadcast disabled so the join actually shuffles.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val hot = spark.range(0, 200000L)
        .select((col("id") % 1000L * 0L).as("k"), col("id").as("v"))
      val tail = spark.range(0, 64L)
        .select((col("id") + 1L).as("k"), col("id").as("v"))
      val left = hot.unionByName(tail)
      val right = spark.range(0, 65L)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("label"))
      val joined = left.join(right, Seq("k"))
      // materialize THIS QueryExecution — count() would build its own,
      // leaving the inspected adaptive plan un-finalized
      assert(joined.collect().length == 200064,
        "skew handling must not change rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew split in the executed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom-filter join: a selective dim filter injects a " +
    "might_contain probe into the fact scan's side — rows pre-filtered " +
    "BEFORE the shuffle, answer unchanged") {
    // the shuffle-join complement of DPP: when the join must shuffle
    // (no broadcast) and one side is selective, the optimizer builds a
    // bloom over the small side's keys and probes it on the fact side
    // pre-exchange — at 100 TB that is the difference between
    // shuffling the whole fact table and shuffling the matching
    // sliver. Size thresholds lowered so a test-scale scan qualifies.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      val dim = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_size") === 1)
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_size")).agg(count(lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n$opt")
      val n = joined.collect().map(_.getLong(1)).sum
      // ground truth with the runtime filter OFF — the bloom may only
      // skip bytes, never rows
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "false")
      val truth = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .count()
      assert(n == truth && truth > 0L,
        s"bloom-filtered join changed the answer: $n vs $truth")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes the " +
    "partitioned fact scan at RUNTIME — one partition's file read, " +
    "dynamicpruning in the plan") {
    // the canonical star-join shape at 100 TB: the fact is partitioned
    // on the join key's column, the dim filter is only known at run
    // time, and Catalyst must turn the broadcast build side into a
    // partition filter on the fact scan (static pruning can't — the
    // admissible event_types are data, not literals)
    val dir = Files.createTempDirectory("graft-dpp")
      .toFile.getAbsolutePath + "/fact"
    Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .repartition(1) // one file per partition value — clean arithmetic
      .write.partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real scan: a LocalRelation's filter constant-
    // folds away and DPP sees no filtering predicate to derive from
    val dimDir = dir + "_dim"
    Seq(("purchase", "rev"), ("click", "eng"), ("view", "eng"),
      ("signup", "acq"), ("error", "ops")).toDF("event_type", "label")
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter($"label" === "rev"), Seq("event_type"))
    val n = joined.count()
    assert(n == Tables(spark, "/root/testdata/sf0.001", "events")
      .filter($"event_type" === "purchase").count(),
      "the pruned join must still see every purchase row")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scansOf)
    }
    val agg = joined.groupBy().count()
    agg.collect()
    val scans = scansOf(agg.queryExecution.executedPlan)
    val factScan = scans
      .find(_.relation.location.rootPaths.exists(_.toString.endsWith("/fact")))
      .get
    assert(factScan.partitionFilters.map(_.toString.toLowerCase)
      .exists(_.contains("dynamicpruning")),
      s"no dynamic pruning subquery on the fact scan:\n" +
        factScan.partitionFilters.mkString("; "))
    assert(factScan.metrics.get("numFiles").exists(_.value == 1L),
      s"fact scan read ${factScan.metrics.get("numFiles").map(_.value)} " +
        "files — runtime pruning should admit exactly one")
  }

  test("IVF partitioned store: the probe filter is a PARTITION filter, " +
    "unprobed cell directories are skipped, results equal in-memory IVF") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.ivfCentroids(corpus, k = 8)
    val store = Files.createTempDirectory("graft-ivf").toFile.getAbsolutePath
    Similarity.writeIvfPartitioned(corpus, cents, store)
    val q = corpus.filter($"vec_id" === 0)
      .select($"embedding").first().getSeq[Float](0)

    val probe = Similarity.ivfTopKPartitioned(spark, store, cents, q,
      k = 10, nprobe = 3)
    // the cell filter must land as a directory-level partition filter,
    // not degrade to a row-group data filter
    val plan = probe.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters: [")).getOrElse("")
    assert(pf.contains("ivf_cell"),
      s"probe filter did not land as a partition filter:\n$plan")
    // execute and read the scan's runtime numFiles: 3 of 8 cells probed
    val got = probe.collect()
    val totalFiles = spark.read.parquet(store).inputFiles.length
    val scanFiles = probe.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(totalFiles >= 8, s"store should span >=8 cell directories")
    assert(scanFiles > 0 && scanFiles < totalFiles,
      s"probe read $scanFiles of $totalFiles files — no directory skip")

    // and the pruned probe returns exactly the in-memory IVF's answer
    val mem = Similarity.ivfTopK(corpus, cents, q, k = 10, nprobe = 3)
      .collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      mem.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("IVF-PQ composite store: directory skip AND codes-only scan — " +
    "no vector bytes read, results equal ADC over the probed subset") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.ivfCentroids(corpus, k = 8)
    val cbs = Similarity.pqTrain(corpus, d = 64, m = 4, k = 4, maxIters = 1)
    val store = Files.createTempDirectory("graft-ivfpq").toFile.getAbsolutePath
    Similarity.writeIvfPqPartitioned(corpus, cents, cbs, store)
    val q = corpus.filter($"vec_id" === 0)
      .select($"embedding").first().getSeq[Float](0)

    val probe = Similarity.ivfPqTopK(spark, store, cents, cbs, q,
      k = 10, nprobe = 3)
    val plan = probe.queryExecution.executedPlan.toString
    // axis 1: the probed-cell filter lands as a directory-level
    // partition filter
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters: [")).getOrElse("")
    assert(pf.contains("ivf_cell"),
      s"probe filter did not land as a partition filter:\n$plan")
    // axis 2: the scan reads codes only — the store carries no vector
    // column at all, so no schema regression can sneak one back in
    val rs = plan.linesIterator
      .find(_.contains("ReadSchema:")).getOrElse("")
    assert(rs.contains("codes") && !rs.contains("embedding"),
      s"ADC scan should read codes only:\n$rs")
    assert(!spark.read.parquet(store).columns.contains("embedding"),
      "composite store must not persist raw vectors")
    // executed-scan numFiles: 3 of >=8 cell directories touched
    val got = probe.collect()
    val totalFiles = spark.read.parquet(store).inputFiles.length
    val scanFiles = probe.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(totalFiles >= 8, s"store should span >=8 cell directories")
    assert(scanFiles > 0 && scanFiles < totalFiles,
      s"probe read $scanFiles of $totalFiles files — no directory skip")

    // ranking equals pqAdcTopK over the probed subset of an in-memory
    // encode — the composite adds pruning, never changes the math.
    // Probe set recomputed the way ivfPqTopK derives it: nprobe nearest
    // centroids by L2, ties to the lower id
    val probed = cents.zipWithIndex.map { case (cvec, i) =>
      (cvec.zip(q).foldLeft(0.0) { case (acc, (x, qq)) =>
        val dd = x.toDouble - qq.toDouble; acc + dd * dd
      }, i)
    }.sorted.take(3).map(_._2)
    val codes = corpus.select($"vec_id",
      Similarity.pqAssign($"embedding", cbs).as("codes"),
      Similarity.ivfAssign($"embedding", cents).as("cell"))
    val memProbed = Similarity.pqAdcTopK(
      codes.filter($"cell".isin(probed.map(Integer.valueOf): _*)),
      cbs, q, k = 10).collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      memProbed.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("residual IVF-PQ: same codes-only pruned layout, and residual " +
    "quantization beats raw-vector quantization on self-distance") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.ivfCentroids(corpus, k = 8)
    val cbs = Similarity.pqTrainResidual(corpus, cents,
      d = 64, m = 4, k = 4, maxIters = 1)
    val store = Files.createTempDirectory("graft-ivfpq-res")
      .toFile.getAbsolutePath
    Similarity.writeIvfPqResidualPartitioned(corpus, cents, cbs, store)
    assert(!spark.read.parquet(store).columns.contains("embedding"),
      "residual store must not persist raw vectors")
    val q = corpus.filter($"vec_id" === 0)
      .select($"embedding").first().getSeq[Float](0)
    val probe = Similarity.ivfPqResidualTopK(spark, store, cents, cbs, q,
      k = 10, nprobe = 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("ivf_cell")),
      s"probe filters did not land as partition filters:\n$plan")
    val got = probe.collect()
    val scanFiles = probe.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    val totalFiles = spark.read.parquet(store).inputFiles.length
    assert(totalFiles >= 8 && scanFiles > 0 && scanFiles < totalFiles,
      s"probe read $scanFiles of $totalFiles files — no directory skip")

    // the recall argument made measurable: the query vector's own
    // quantized self-distance under residual codes is at most its
    // raw-variant self-distance (residuals cluster tighter, so the
    // codebooks describe them better)
    val rawCbs = Similarity.pqTrain(corpus, d = 64, m = 4, k = 4,
      maxIters = 1)
    val rawStore = Files.createTempDirectory("graft-ivfpq-raw")
      .toFile.getAbsolutePath
    Similarity.writeIvfPqPartitioned(corpus, cents, rawCbs, rawStore)
    val self = got.find(_.getLong(0) == 0L).map(_.getDouble(1))
    val rawSelf = Similarity.ivfPqTopK(spark, rawStore, cents, rawCbs, q,
      k = 10, nprobe = 3).collect()
      .find(_.getLong(0) == 0L).map(_.getDouble(1))
    assert(self.isDefined, "query vector should be in its own top-k")
    assert(rawSelf.forall(r => self.get <= r),
      s"residual self-distance ${self.get} should not exceed raw $rawSelf")
  }

  test("compaction: file count follows the byte target; the partitioned " +
    "variant lands one file per partition; content is untouched") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"user_id", $"event_type")
    val root = Files.createTempDirectory("graft-compact").toString
    // a 48-file small-file mess
    ev.repartition(48).write.mode("overwrite").parquet(s"$root/small")
    val smallFiles = spark.read.parquet(s"$root/small").inputFiles.length
    assert(smallFiles >= 40, s"fixture should fragment, got $smallFiles")

    // flat compact: a huge byte target ⇒ exactly one file
    graft.operators.Compaction.compact(spark, s"$root/small",
      s"$root/one", targetBytes = 1L << 30)
    assert(spark.read.parquet(s"$root/one").inputFiles.length == 1)
    // a small target ⇒ ceil(bytes/target) files
    val bytes = graft.operators.Compaction.tableBytes(spark, s"$root/small")
    val target = math.max(1L, bytes / 4)
    graft.operators.Compaction.compact(spark, s"$root/small",
      s"$root/four", targetBytes = target)
    val expect = ((bytes + target - 1) / target).toInt
    assert(spark.read.parquet(s"$root/four").inputFiles.length == expect)
    // content preserved exactly
    assert(spark.read.parquet(s"$root/four").orderBy($"event_id")
      .collect().toSeq ==
      spark.read.parquet(s"$root/small").orderBy($"event_id")
        .collect().toSeq)

    // partitioned compact: fragment a partitioned table, then one file
    // per live partition dir, scheme preserved
    ev.withColumn("bucket", $"user_id" % 4)
      .repartition(24)
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$root/part_small")
    val fragmented = spark.read.parquet(s"$root/part_small")
    assert(fragmented.inputFiles.length > 4)
    graft.operators.Compaction.compactPartitioned(spark,
      s"$root/part_small", s"$root/part_packed", Seq("bucket"))
    val packed = spark.read.parquet(s"$root/part_packed")
    assert(packed.inputFiles.length == 4,
      s"expected one file per partition, got ${packed.inputFiles.length}")
    assert(packed.inputFiles.forall(_.contains("bucket=")),
      "partition directory scheme must survive compaction")
    assert(packed.orderBy($"event_id").collect().toSeq ==
      fragmented.orderBy($"event_id").collect().toSeq)
  }

  test("manifest data skipping: the pruned scan plans over a strict " +
    "subset of files, rows equal the plain filter, empty miss is empty") {
    import graft.operators.Skipping
    val root = Files.createTempDirectory("graft-skip").toString
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey")
    Skipping.writeClustered(li, "l_orderkey", numFiles = 16,
      path = s"$root/store")
    Skipping.writeManifest(spark, s"$root/store", Seq("l_orderkey"),
      s"$root/manifest")
    val total = spark.read.parquet(s"$root/store").inputFiles.length
    assert(total == 16, s"range-clustered write should land 16 files, " +
      s"got $total")

    // a selective range touches few files: the scan is PLANNED over the
    // manifest's survivors, so the leaf's numFiles is the pruned count
    // metrics read off the exchange-free scan plan (an orderBy would
    // wrap it in AdaptiveSparkPlanExec, whose collectLeaves hides the
    // file scan); row equality is checked on a sorted copy below
    val hit = Skipping.scanRange(spark, s"$root/store", s"$root/manifest",
      "l_orderkey", 100L, 200L)
    val got = hit.collect().toSeq
      .sortBy(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val scanFiles = hit.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    assert(scanFiles > 0 && scanFiles < total,
      s"pruned scan read $scanFiles of $total files — no skipping")
    val want = li.filter($"l_orderkey".between(100L, 200L))
      .collect().toSeq
      .sortBy(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got == want, "pruning changed rows")

    // a miss outside the key domain returns an empty frame with the
    // table's schema, not an error
    val miss = Skipping.scanRange(spark, s"$root/store", s"$root/manifest",
      "l_orderkey", 10000000L, 20000000L)
    assert(miss.schema.fieldNames.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_partkey"))
    assert(miss.count() == 0L)
  }

  test("bucketed tables: co-located sort-merge join without exchanges") {
    val wh = Files.createTempDirectory("graft-bucketed").toFile.getAbsolutePath
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftbuck LOCATION '$wh'")
    try {
      left.write.format("parquet").bucketBy(8, "id").sortBy("id")
        .mode("overwrite").saveAsTable("graftbuck.bl")
      right.write.format("parquet").bucketBy(8, "id").sortBy("id")
        .mode("overwrite").saveAsTable("graftbuck.br")
      // bucketed scans satisfy the join's distribution: no shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graftbuck.bl")
          .join(spark.table("graftbuck.br"), Seq("id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        assert(joined.count() == 1000L)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graftbuck CASCADE")
    }
  }

  test("PPJoin crossover on a zipfian corpus: prefix index shrinks " +
    "Σ df² and the candidate set, wins wall-clock, loses no pair") {
    // The driver fixture's ~uniform 512-word vocabulary has no heavy
    // tail, so prefixes cannot prune there (documented beside
    // dedup_jaccard_prefix). This corpus has the df distribution a real
    // web crawl has: 3000-word vocabulary with zipf-shaped draws
    // (inverse-log transform of a deterministic per-(doc,pos) hash —
    // P(rank r) ∝ 1/r), 3600 docs of 40 words, plus 60 planted
    // near-copies so the threshold-0.7 answer is non-empty. The corpus
    // is sized so the hot grams' Σ df² (tens of millions of candidate
    // rows) dominates the fixed per-stage overhead — the regime the
    // crossover claim is about; at a tenth the size the prefix arm's
    // extra window passes outweigh the quadratic term and the full
    // index wins, which is exactly the driver-fixture observation.
    val nDocs = 3600
    val L = 40
    val V = 3000
    def word(d: Int, i: Int): String = {
      val h = d * 6364136223846793005L + i * 1442695040888963407L
      val u = (h >>> 11).toDouble / (1L << 53).toDouble
      s"w${math.min(V, math.max(1, math.exp(u * math.log(V)).toInt))}"
    }
    val base = (0 until nDocs).map { d =>
      (d.toLong, "web", (0 until L).map(word(d, _)).mkString(" "))
    }
    val copies = (0 until 60).map { j =>
      val mut = base(j)._3.split(" ").dropRight(4) ++
        (0 until 4).map(i => s"uniq${j}x$i")
      ((nDocs + j).toLong, "web", mut.mkString(" "))
    }
    val corpus = (base ++ copies).toDF("doc_id", "source", "text")
    val threshold = 0.7
    val kept = corpus
      .select($"source".as("blk"), $"doc_id",
        explode(array_distinct(Dedup.shingles($"text", 2))).as("gram"))
      .cache()
    kept.count()
    try {
      // 1) the cost model: Σ prefix-df² ≪ Σ df² — this gap is the
      //    PPJoin claim itself, measured
      def sumDfSq(idx: org.apache.spark.sql.DataFrame): Long =
        idx.groupBy($"blk", $"gram").count()
          .agg(sum($"count" * $"count")).head().getLong(0)
      val fullWork = sumDfSq(kept)
      val prefWork = sumDfSq(
        Dedup.jaccardPrefixIndex(kept, "doc_id", threshold))
      assert(prefWork * 4 < fullWork,
        s"Σ prefix-df² = $prefWork not ≪ Σ df² = $fullWork")
      // 2) the candidate sets it buys: prefix candidates ≪ full index
      //    candidates (distinct pairs sharing any gram)
      val candFull = kept.select($"blk", $"gram", $"doc_id".as("doc_a"))
        .join(kept.select($"blk", $"gram", $"doc_id".as("doc_b")),
          Seq("blk", "gram"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b").distinct().count()
      val candPref =
        Dedup.jaccardPrefixCandidates(kept, "doc_id", threshold).count()
      assert(candPref * 4 < candFull,
        s"prefix candidates $candPref not ≪ full candidates $candFull")
      // 3) wall-clock at matching threshold — each arm timed on the
      //    run whose pairs the equality check reuses, and the prefix
      //    arm runs FIRST so JIT/codegen warm-up biases AGAINST the
      //    claim.
      def timedPairs(
          df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Double) = {
        val t0 = System.nanoTime
        val ps = df.select($"doc_a", $"doc_b")
          .as[(Long, Long)].collect().toSet
        (ps, (System.nanoTime - t0) / 1e9)
      }
      val (got, tPref) = timedPairs(Dedup.ngramJaccardPairsPrefix(
        corpus, threshold = threshold, n = 2))
      val (want, tFull) = timedPairs(Dedup.ngramJaccardPairs(
        corpus, threshold = threshold, n = 2))
      // wall-clock is an OBSERVATION, not the gate: the deterministic
      // Σdf² and candidate-count assertions above already prove the
      // crossover, and a single timed run on a loaded CI box can lose
      // to GC jitter without contradicting them
      info(f"prefix join $tPref%.2fs vs full index join $tFull%.2fs " +
        s"(Σdf² $fullWork vs $prefWork, candidates $candFull vs $candPref)")
      // 4) and the filter is lossless: identical surviving pairs
      assert(got == want, "prefix filtering changed the answer")
      assert(want.nonEmpty, "fixture produced no near-dup pairs — the " +
        "equality check proved nothing")
    } finally kept.unpersist()
  }
}
