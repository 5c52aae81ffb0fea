package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Text-analysis suite: normalization, token counts, language ID (argmax +
  * tie-break), quality signals, fingerprint stability. */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(
      implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as("r")).as[T].head()

  test("normalize: lowercase, strip non-alnum, collapse whitespace") {
    assert(one[String](TextAnalysis.normalize($"text"), "  Héllo,   WORLD!2 ") ==
      "h llo world 2")
    assert(one[String](TextAnalysis.normalize($"text"), "...") == "")
  }

  test("tokenCount: whitespace tokens of normalized text, 0 for empty") {
    assert(one[Long](TextAnalysis.tokenCount($"text"), "one two  three") == 3L)
    assert(one[Long](TextAnalysis.tokenCount($"text"), "!!!") == 0L)
    assert(one[Long](TextAnalysis.tokenCount($"text"), "") == 0L)
  }

  test("subwordCount: alpha runs + digit runs + isolated symbols") {
    // "abc123!x" -> abc | 123 | ! | x
    assert(one[Long](TextAnalysis.subwordCount($"text"), "abc123!x") == 4L)
  }

  test("langId: picks the language with most stopword hits") {
    assert(one[String](TextAnalysis.langId($"text"),
      "the cat and the dog of the house") == "en")
    assert(one[String](TextAnalysis.langId($"text"),
      "der hund und die katze und das haus") == "de")
    assert(one[String](TextAnalysis.langId($"text"),
      "el perro y los gatos es una casa y") == "es")
    assert(one[String](TextAnalysis.langId($"text"),
      "le chien est une maison et les chats") == "fr")
    // no stopwords at all -> undetermined
    assert(one[String](TextAnalysis.langId($"text"),
      "zzz qqq xxx") == "und")
    // tie -> alphabetically first language ("the" en x1, "und" de x1)
    assert(one[String](TextAnalysis.langId($"text"), "the und") == "de")
  }

  test("quality columns: exact counts and IEEE ratios") {
    val row = TextAnalysis.withQuality(Seq((1L, "Hi, there!")).toDF("doc_id", "text"))
      .select($"n_chars_q", $"n_words", $"punct_ratio", $"alpha_ratio",
        $"stopword_ratio")
      .collect().head
    assert(row.getLong(0) == 10L)          // chars
    assert(row.getLong(1) == 2L)           // "hi there"
    assert(row.getDouble(2) == 2.0 / 10.0) // ',' and '!'
    assert(row.getDouble(3) == 7.0 / 10.0) // hithere = 7 alpha
    assert(row.getDouble(4) == 0.0)        // no en stopwords
  }

  test("fingerprint: stable under case/punctuation noise, md5 hex shape") {
    val fp1 = one[String](TextAnalysis.fingerprint($"text"), "Some Document")
    val fp2 = one[String](TextAnalysis.fingerprint($"text"), "some,  document!!")
    val fp3 = one[String](TextAnalysis.fingerprint($"text"), "another doc")
    assert(fp1 == fp2)
    assert(fp1 != fp3)
    assert(fp1.matches("[0-9a-f]{32}"))
  }

  test("approx_percentile twin tracks exact percentile within GK rank bound") {
    import org.apache.spark.sql.functions._
    // skewed lengths so p50/p90 sit on distinct values
    val docs = (1 to 2000).map(i => (i.toLong, ("w " * (i % 97 + 1)).trim))
      .toDF("doc_id", "text")
    val stats = docs
      .select(TextAnalysis.tokenCount($"text").as("n_tok"))
      .agg(
        expr("percentile(n_tok, array(0.5D, 0.9D))").as("exact"),
        expr("approx_percentile(n_tok, array(0.5D, 0.9D), 1000000)").as("approx"))
      .collect().head
    val exact = stats.getSeq[Double](0)
    val approx = stats.getSeq[Long](1)
    // accuracy 1e6 over n=2000 → rank error < 1: the sketch must return an
    // actual element whose rank brackets the interpolated exact value
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 1.0, s"exact=$e approx=$a")
    }
  }

  test("packByTokenBudget: docs chunk by start offset in id order per group") {
    // src a: token counts 3, 4, 2 → offsets 0, 3, 7 → packs 0, 0, 1 at
    // budget 5 (doc 2 STARTS in pack 0 though it spans the boundary)
    val docs = Seq(
      (1L, "a", "one two three"),
      (2L, "a", "one two three four"),
      (3L, "a", "one two"),
      (4L, "b", "one two three four five six")) // fresh group: offset 0
      .toDF("doc_id", "source", "text")
    val packed = TextAnalysis.packByTokenBudget(docs, budgetTokens = 5)
      .select($"doc_id", $"n_tokens", $"start_off", $"pack_id")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(packed == Seq((1L, 3L, 0L, 0L), (2L, 4L, 3L, 0L),
      (3L, 2L, 7L, 1L), (4L, 6L, 0L, 0L)))
  }

  test("packByTokenBudget: two-level prefix sum equals the single-window " +
    "formulation and spreads one giant source over many chunks") {
    import org.apache.spark.sql.expressions.Window
    // ONE source, 200 docs with varying token counts and a gappy,
    // unsorted-ingest id space — the shape that serialized the old
    // single-window plan onto one task
    val docs = (1 to 200).map { i =>
      val id = i.toLong * 7 + (i % 3) // gappy, still unique
      (id, "cc", (0 until (i % 5) + 1).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "source", "text")

    // chunkShift=4 → ids span 7..1402, ~88 chunks of 16 ids
    val packed = TextAnalysis.packByTokenBudget(docs, budgetTokens = 7,
      chunkShift = 4)
    // reference: the exact single-window arithmetic
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs
      .withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
      .withColumn("start_off", coalesce(sum($"n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr("start_off div 7"))
      .select($"doc_id", $"n_tokens", $"start_off", $"pack_id")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val got = packed.select($"doc_id", $"n_tokens", $"start_off", $"pack_id")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == ref)

    // the plan's running-sum window partitions on (source, chunk), not
    // source alone — the single source's prefix sum runs across >1
    // window partition (parallelism = #chunks)
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"),
      s"expected chunked window partitioning in plan:\n$plan")
    // the chunk-offset frame must come back as a broadcast join — a
    // shuffled join here would re-exchange the corpus on (source, chunk)
    assert(plan.contains("BroadcastHashJoin"),
      s"chunk offsets should broadcast:\n$plan")
    val nChunks = docs
      .select(shiftright($"doc_id".cast("long"), 4).as("c"))
      .distinct().count()
    assert(nChunks > 50, s"fixture only produced $nChunks chunks")
  }

  test("packByTokenBudget: randomized corpora (negative ids, multiple " +
    "groups, varied chunkShift) match the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    (0 until 3).foreach { trial =>
      val shift = Seq(0, 3, 8)(trial)
      val docs = (0 until 120).map { _ =>
        // negative ids exercise the arithmetic-shift (floor-division)
        // chunking edge; collisions are discarded by distinctness below
        val id = rnd.nextLong() % 10000
        val grp = s"s${rnd.nextInt(3)}"
        (id, grp, (0 until rnd.nextInt(6)).map(j => s"t$j").mkString(" "))
      }.distinctBy(_._1).toDF("doc_id", "source", "text")
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ref = docs
        .withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
        .withColumn("start_off", coalesce(sum($"n_tokens").over(w), lit(0L)))
        .withColumn("pack_id", expr("start_off div 11"))
        .select($"doc_id", $"start_off", $"pack_id")
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      val got = TextAnalysis.packByTokenBudget(docs, budgetTokens = 11,
        chunkShift = shift)
        .select($"doc_id", $"start_off", $"pack_id")
        .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
      assert(got == ref, s"trial $trial (chunkShift=$shift)")
    }
  }

  test("packByTokenBudget: non-integral ids fall back to the " +
    "single-window path instead of silently dropping rows") {
    val docs = Seq(
      ("doc-b", "a", "one two three"),
      ("doc-a", "a", "one two three four"),
      ("doc-c", "a", "one two"))
      .toDF("doc_id", "source", "text")
    // string ids order doc-a < doc-b < doc-c; offsets 0, 4, 7 at budget 5
    val packed = TextAnalysis.packByTokenBudget(docs, budgetTokens = 5)
      .select($"doc_id", $"start_off", $"pack_id")
      .orderBy("doc_id").as[(String, Long, Long)].collect().toSeq
    assert(packed == Seq(("doc-a", 0L, 0L), ("doc-b", 4L, 0L),
      ("doc-c", 7L, 1L)))
  }

  test("topTfIdf: per-doc top-k by tf-rarity, deterministic tie-break, " +
    "empty docs emit nothing, rank plans as WindowGroupLimit") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "..."))  // normalizes to empty -> no tokens, no rows
      .toDF("doc_id", "text")
    val out = TextAnalysis.topTfIdf(docs, k = 2)
    val rows = out.orderBy("doc_id", "term_rank")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    // N=3 (doc 3 still counts toward the corpus size); df: apple 1,
    // banana 2, cherry 1. doc1: apple 2*4/2=4.0, banana 1*4/3; doc2:
    // cherry 1*4/2=2.0, banana 4/3
    assert(rows == Seq(
      (1L, "apple", 2L, 1L, 4.0, 1L),
      (1L, "banana", 1L, 2L, 4.0 / 3.0, 2L),
      (2L, "cherry", 1L, 1L, 2.0, 1L),
      (2L, "banana", 1L, 2L, 4.0 / 3.0, 2L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-k should plan as WindowGroupLimit:\n$plan")
  }

  test("stratifiedSample: exact quota per group, deterministic, " +
    "salt-sensitive") {
    val docs = (1 to 100).map(i => (i.toLong, s"s${i % 4}", s"d$i"))
      .toDF("doc_id", "source", "text")
    val a = TextAnalysis.stratifiedSample(docs, k = 7)
      .select($"doc_id").as[Long].collect().toSet
    val b = TextAnalysis.stratifiedSample(docs, k = 7)
      .select($"doc_id").as[Long].collect().toSet
    val c = TextAnalysis.stratifiedSample(docs, k = 7, salt = "other")
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b) // deterministic
    assert(a != c) // re-salting draws a different sample
    assert(a.size == 28) // exactly 7 from each of 4 sources
    // a group smaller than k yields the whole group
    val small = TextAnalysis.stratifiedSample(docs.filter($"doc_id" <= 2), 7)
    assert(small.count() == 2)
  }

  test("deterministic shard shuffle: stable under reruns and " +
    "repartitioning, shards bounded, shard-local positions contiguous " +
    "from 1") {
    import org.apache.spark.sql.expressions.Window
    def shuffle(df: org.apache.spark.sql.DataFrame) = {
      val h = md5(concat(lit("shuf:"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      df.select(col("doc_id"), h.as("h"))
        .withColumn("shard",
          conv(substring(col("h"), 1, 8), 16, 10).cast("long") % 16)
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    }
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = shuffle(docs).as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = shuffle(docs.repartition(7)).as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "order assignment must survive repartition")
    assert(a.forall(r => r._2 >= 0 && r._2 < 16))
    // each shard's positions are exactly 1..n_shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("bpeTrain: greedy merges with left-to-right non-overlapping fuse " +
    "(doubled letters), lexicographic tie-break, loud pair exhaustion") {
    // 'aaa'×2 + 'ab': round 1 counts (a,a)=4 (two overlapping positions
    // per word — BPE counts positions), fuses LEFT-TO-RIGHT so a|a|a →
    // aa|a (NOT a|aa); round 2 merges (aa,a); round 3 only (a,b) is left
    val docs = Seq("aaa aaa ab", "aaa").toDF("text")
    val (ms, tbl) = TextAnalysis.bpeTrain(docs, merges = 3)
    assert(ms.map(m => (m.round, m.lhs, m.rhs, m.count)) ==
      Seq((1, "a", "a", 6L), (2, "aa", "a", 3L), (3, "a", "b", 1L)))
    val enc = tbl.select(col("word"), col("sym")).as[(String, String)]
      .collect().toMap
    assert(enc == Map("aaa" -> "aaa", "ab" -> "ab"))
    // round 4 has no adjacent pairs anywhere → loud contract failure
    val e = intercept[IllegalArgumentException](
      TextAnalysis.bpeTrain(docs, merges = 4))
    assert(e.getMessage.contains("no adjacent pairs"))
    // equal-count pairs break lexicographically: (x,y) beats (z,w)
    val tie = Seq("xy zw").toDF("text")
    val (tms, _) = TextAnalysis.bpeTrain(tie, merges = 1)
    assert(tms.head.lhs == "x" && tms.head.rhs == "y" && tms.head.count == 1L)
  }

  test("bpeFusePair: whole-symbol matching only — a merge (b,c) must not " +
    "fuse across the boundary of symbols [ab, c]") {
    // corpus engineered so round 1 learns (a,b) (tie vs (b,c), lex wins),
    // round 2 learns (b,c): word 'abc' is then symbols [ab, c], whose
    // joined form 'ab|c' CONTAINS the substring 'b|c' — a raw substring
    // replace would corrupt it to 'abc' two rounds early
    val docs = Seq("ab ab ab abc bc bc bc").toDF("text")
    val (ms, tbl) = TextAnalysis.bpeTrain(docs, merges = 2)
    assert(ms.map(m => (m.round, m.lhs, m.rhs, m.count)) ==
      Seq((1, "a", "b", 4L), (2, "b", "c", 3L)))
    val enc = tbl.select(col("word"), col("sym")).as[(String, String)]
      .collect().toMap
    assert(enc("abc") == "ab|c",
      "merge (b,c) fused across the [ab, c] symbol boundary")
    assert(enc("bc") == "bc" && enc("ab") == "ab")
    // round 3 still has the (ab, c) pair BECAUSE round 2 left it alone
    val (ms3, tbl3) = TextAnalysis.bpeTrain(docs, merges = 3)
    assert(ms3.last.lhs == "ab" && ms3.last.rhs == "c" && ms3.last.count == 1L)
    assert(tbl3.filter(col("word") === "abc").select(col("sym"))
      .as[String].head() == "abc")
  }

  test("bpeFusePair property: equals the reference left-to-right " +
    "scan-and-skip on random symbol sequences, for merges whose tokens " +
    "overlap each other") {
    // alphabet chosen so merge tokens collide with symbol PREFIXES and
    // with each other ("ab" vs "a"+"b") — the cases a substring-based
    // fuse gets wrong
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "ab", "ba", "c")
    val syms = (1 to 400).map { _ =>
      (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString("|")
    }
    // the reference algorithm, verbatim: scan left to right, fuse and
    // SKIP, never reconsider the fused token
    def refFuse(sym: String, lhs: String, rhs: String): String = {
      val xs = sym.split("\\|")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < xs.length) {
        if (i + 1 < xs.length && xs(i) == lhs && xs(i + 1) == rhs) {
          out += lhs + rhs; i += 2
        } else { out += xs(i); i += 1 }
      }
      out.mkString("|")
    }
    for ((lhs, rhs) <- Seq(("a", "b"), ("a", "a"), ("ab", "a"),
      ("b", "ba"), ("ba", "b"), ("c", "ab"))) {
      val got = syms.toDF("sym")
        .withColumn("fused", TextAnalysis.bpeFusePair(col("sym"), lhs, rhs))
        .as[(String, String)].collect()
      got.foreach { case (s, f) =>
        assert(f == refFuse(s, lhs, rhs), s"sym=$s merge=($lhs,$rhs)")
      }
    }
  }

  test("bpeApply: frozen tokenizer prices held-out words — trained words " +
    "get their trained encoding, unseen words char-fall-back, none drop") {
    val train = Seq("ab ab ab abc bc bc bc").toDF("text")
    val (ms, _) = TextAnalysis.bpeTrain(train, merges = 3)
    val held = Seq("abc cab zq ab").toDF("text")
    val out = TextAnalysis.bpeApply(ms, held)
      .select(col("word"), col("sym")).as[(String, String)].collect().toMap
    // every held-out word tokenizes — the no-silent-drop contract
    assert(out.keySet == Set("abc", "cab", "zq", "ab"))
    assert(out("abc") == "abc" && out("ab") == "ab")
    // 'cab' is unseen but its suffix fuses under merge (a,b); 'zq' has
    // no trained merges at all and stays at characters
    assert(out("cab") == "c|ab")
    assert(out("zq") == "z|q")
  }

  test("featureHash: word counts land in stable md5 buckets, repeats " +
    "accumulate, empty docs drop, totals preserved") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta"),
      (3L, "!!!")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, nBuckets = 64)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // empty doc 3 contributes nothing; every count is positive
    assert(out.forall(_._1 != 3L) && out.forall(_._3 > 0))
    assert(out.forall(r => r._2 >= 0 && r._2 < 64))
    // token mass is preserved: 3 tokens for doc 1, 1 for doc 2
    assert(out.filter(_._1 == 1L).map(_._3).sum == 3L)
    assert(out.filter(_._1 == 2L).map(_._3).sum == 1L)
    // the same word hashes to the same bucket in every doc
    val beta1 = out.filter(r => r._1 == 1L && r._3 == 2L).map(_._2)
    val alphaBucket = out.filter(r => r._1 == 1L && r._3 == 2L)
    assert(alphaBucket.length == 1, "doc 1's repeated word is one bucket row")
    val betaB2 = out.filter(_._1 == 2L).map(_._2).toSet
    val doc1Buckets = out.filter(_._1 == 1L).map(_._2).toSet
    assert(betaB2.subsetOf(doc1Buckets), "shared word shares its bucket")
    assert(beta1.nonEmpty)
  }

  test("sourceMixture: uniform-target downsampling rates, cap at 1.0") {
    // sources: a = 60 tokens, b = 30, c = 10 → total 100, n=3
    val docs = Seq(
      (1L, "a", Seq.fill(60)("w").mkString(" ")),
      (2L, "b", Seq.fill(30)("w").mkString(" ")),
      (3L, "c", Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val m = TextAnalysis.sourceMixture(docs).orderBy("source")
      .select($"source", $"n_tokens", $"share", $"weight")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(m == Seq(
      ("a", 60L, 0.6, 100.0 / 180),  // oversized source downsampled
      ("b", 30L, 0.3, 1.0),          // 100/90 caps at 1.0
      ("c", 10L, 0.1, 1.0)))         // undersized source kept whole
  }

  test("chunkByTokens: 50% overlap, clamped tail, exact offsets") {
    val d = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(d, chunkTokens = 4, stride = 2)
      .select($"chunk_idx", $"start_tok", $"n_tok", $"chunk_text")
      .orderBy("chunk_idx")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 4L, "a b c d"),
      (1L, 2L, 4L, "c d e f"),
      (2L, 4L, 4L, "e f g h"),
      (3L, 6L, 4L, "g h i j"),
      (4L, 8L, 2L, "i j")))   // short tail kept, clamped slice
    // disjoint chunking: stride == chunk size, no overlap
    val dj = TextAnalysis.chunkByTokens(d, chunkTokens = 4, stride = 4)
      .select($"chunk_text").as[String].collect().toSeq
    assert(dj == Seq("a b c d", "e f g h", "i j"))
  }

  test("repetition fractions: duplicate words and 2-grams, empty-safe") {
    val d = Seq(
      ("a b c a b a", 3.0 / 6, 1.0 / 5), // words a,b,c,a,b,a; grams: "a b" x2 dup
      ("x y z w", 0.0, 0.0),             // all unique
      ("q q q q", 3.0 / 4, 2.0 / 3))     // one word; "q q" x3
      .toDF("text", "ew", "eg")
      .select(TextAnalysis.dupWordFrac($"text").as("dw"),
        TextAnalysis.dupNgramFrac($"text", 2).as("dg"), $"ew", $"eg")
      .as[(Double, Double, Double, Double)].collect().toSeq
    d.foreach { case (dw, dg, ew, eg) =>
      assert(math.abs(dw - ew) < 1e-12 && math.abs(dg - eg) < 1e-12, d)
    }
    // empty text: words = [""], one distinct element — fraction 0, no NaN
    val e = Seq("").toDF("text")
      .select(TextAnalysis.dupWordFrac($"text")).as[Double].head()
    assert(e == 0.0)
  }

  test("stripMarkup: drops script/style wholesale, removes tags, decodes " +
    "entities after tag removal, collapses whitespace") {
    val strip = (s: String) => one[String](TextAnalysis.stripMarkup($"text"), s)
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    // stray '<' INSIDE a script block must not derail tag removal
    assert(strip("a<script>if (1 < 2) { x(\"<q>\"); }</script>b") == "a b")
    assert(strip("a<style type=\"x\">p { color: red; }</style>b") == "a b")
    // entities decode AFTER tags: "&lt;p&gt;" is literal text, not a tag;
    // double-escaped &amp;lt; decodes once to the literal "&lt;"
    assert(strip("&lt;p&gt; &amp;lt; Q&amp;A &nbsp;x") == "<p> &lt; Q&A x")
    // malformed markup degrades to whitespace, never drops prose
    assert(strip("ok <unclosed attr=\"v\" ok2") == "ok <unclosed attr=\"v\" ok2"
      .replaceAll("<[^>]*>", " ").trim.replaceAll("\\s+", " "))
    assert(strip("   plain    text\n\there  ") == "plain text here")
  }

  test("extractUrls: http(s) URLs in document order, terminated by " +
    "whitespace/quotes/brackets") {
    val urls = (s: String) =>
      one[Seq[String]](TextAnalysis.extractUrls($"text"), s)
    // commas are legal URL characters — only whitespace/quote/bracket
    // delimiters end a match
    assert(urls("see https://a.io/x?q=1 and http://b.co,p end") ==
      Seq("https://a.io/x?q=1", "http://b.co,p"))
    assert(urls("<a href=\"https://e.com/d/7\">t</a>") == Seq("https://e.com/d/7"))
    assert(urls("no links here") == Seq.empty)
  }

  test("urlDomain: host between scheme and first /:?# delimiter") {
    val dom = (s: String) => one[String](TextAnalysis.urlDomain($"text"), s)
    assert(dom("https://a.example.com/path?q=1") == "a.example.com")
    assert(dom("http://host:8080/x") == "host")
    assert(dom("https://bare.io") == "bare.io")
    assert(dom("https://h.io#frag") == "h.io")
    assert(dom("not a url") == "")
  }

  test("canonicalizeUrl: fragment, host case, default ports, tracking " +
    "params, trailing slash — and what must NOT change") {
    val can = (s: String) => one[String](TextAnalysis.canonicalizeUrl($"text"), s)
    assert(can("HTTP://Example.COM:80/Path/") == "http://example.com/Path",
      "host lowercases, default port and trailing slash drop — " +
        "the PATH keeps its case")
    assert(can("https://h.io:443/a#frag") == "https://h.io/a")
    assert(can("https://h.io/a?utm_source=x&utm_medium=y") == "https://h.io/a")
    assert(can("https://h.io/a?utm_x=1&b=2&fbclid=z") == "https://h.io/a?b=2",
      "tracking params drop wherever they sit; real params survive")
    assert(can("https://h.io/a?b=2&gclid=q#f") == "https://h.io/a?b=2")
    assert(can("http://h.io:8080/a") == "http://h.io:8080/a",
      "a NON-default port is meaningful and must survive")
    assert(can("https://h.io:80/a") == "https://h.io:80/a",
      ":80 is only default for http, not https")
    assert(can("https://h.io/") == "https://h.io")
    assert(can("https://h.io/utm_source/x") == "https://h.io/utm_source/x",
      "only QUERY params strip — path segments are content")
    assert(can("not a url") == "not a url", "non-URLs pass through")
  }

  test("canonicalizeUrl is IDEMPOTENT over generated messy URLs — " +
    "canonical forms are fixed points") {
    // a canonicalizer that moves an already-canonical URL would make
    // URL-dedup keys unstable across pipeline stages; one DataFrame
    // pass evaluates all cases
    val schemes = Seq("http://", "HTTP://", "https://", "HTTPS://")
    val hosts = Seq("Ex.COM", "ex.com", "a.B.c")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/P/x", "/P/x/")
    val queries = Seq("", "?utm_source=a", "?a=1&utm_b=2&c=3",
      "?utm_a=1&utm_b=2", "?x=1&fbclid=z", "?gclid=1&y=2")
    val frags = Seq("", "#f", "#utm_source=t")
    val urls = for {
      s <- schemes; h <- hosts; p <- ports; pa <- paths
      q <- queries; f <- frags
    } yield s + h + p + pa + q + f
    val out = urls.toDF("u")
      .select($"u", TextAnalysis.canonicalizeUrl($"u").as("c1"))
      .select($"u", $"c1", TextAnalysis.canonicalizeUrl($"c1").as("c2"))
      .filter($"c1" =!= $"c2")
      .collect()
    assert(out.isEmpty,
      s"${out.length} non-fixed-points, e.g. ${out.take(3).mkString("; ")}")
  }

  test("sampleExactK: exactly k rows, deterministic, salt-independent " +
    "draws, TakeOrdered plan (no global sort)") {
    val docs = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextAnalysis.sampleExactK(docs, 50)
    val ids1 = a.select($"doc_id").as[Long].collect().toSet
    val ids2 = TextAnalysis.sampleExactK(docs, 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids1.size == 50 && ids1 == ids2) // exact size, rerun-stable
    val other = TextAnalysis.sampleExactK(docs, 50, salt = "other")
      .select($"doc_id").as[Long].collect().toSet
    assert(other.size == 50 && other != ids1) // re-salting redraws
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"exact-k sample must plan as TakeOrdered, not a global sort:\n$plan")
  }

  test("sampleWeighted: keep probability proportional to score, " +
    "deterministic, zero-score never kept, clip at 1") {
    // scores 1..500: p_i = min(1, 200·i/Σ) — expected kept ≈ Σ min(1, ·)
    val docs = (1L to 500L).map(i => (i, i)).toDF("doc_id", "score")
      .withColumn("score", $"score".cast("long"))
    val kept = TextAnalysis.sampleWeighted(docs, "score", targetRows = 200)
    val rows = kept.select($"doc_id", $"p").as[(Long, Double)].collect()
    val total = (1L to 500L).sum.toDouble
    val expected = (1L to 500L).map(i => math.min(1.0, 200 * i / total)).sum
    assert(math.abs(rows.length - expected) < expected * 0.25,
      s"kept ${rows.length}, expected ≈ $expected")
    // rerun-stable
    val again = TextAnalysis.sampleWeighted(docs, "score", targetRows = 200)
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == again)
    // the sample is biased toward high scores: kept mean above corpus mean
    assert(rows.map(_._1).sum.toDouble / rows.length > 250.5)
    // p is clipped at 1 and zero scores can never be kept
    assert(rows.forall(_._2 <= 1.0))
    val withZero = docs.withColumn("score",
      when($"doc_id" <= 100, lit(0L)).otherwise($"score"))
    val keptZero = TextAnalysis.sampleWeighted(withZero, "score", 200)
      .select($"doc_id").as[Long].collect()
    assert(keptZero.forall(_ > 100), "zero-score rows must never be kept")
  }

  test("sampleTokenBudget: per-group cap, straddling doc ships, " +
    "deterministic order, groups independent") {
    // 3-token docs; budget 10 → kept cumsum-before per group: 0,3,6,9
    // (the 4th doc straddles 10 and ships), 5th (before=12) does not
    val docs = (1L to 40L).map(i =>
      (i, if (i <= 20) "a" else "b", "one two three")).toDF(
      "doc_id", "source", "text")
    val kept = TextAnalysis.sampleTokenBudget(docs, budgetTokens = 10)
    val rows = kept.select($"doc_id", $"source", $"tokens_before")
      .as[(Long, String, Long)].collect()
    val byGroup = rows.groupBy(_._2)
    assert(byGroup.keySet == Set("a", "b"))
    byGroup.foreach { case (g, rs) =>
      assert(rs.length == 4, s"group $g kept ${rs.length}, expected 4")
      assert(rs.map(_._3).sorted.toSeq == Seq(0L, 3L, 6L, 9L), s"group $g")
    }
    // rerun-stable: the same 8 docs every time
    val again = TextAnalysis.sampleTokenBudget(docs, budgetTokens = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == again)
    // a budget below the smallest doc still admits the first doc per
    // group (tokens_before = 0 < any positive budget)
    val tiny = TextAnalysis.sampleTokenBudget(docs, budgetTokens = 1)
      .select($"doc_id").as[Long].collect()
    assert(tiny.length == 2)
  }

  test("vocabProfile: approx (HLL++) distinct-term counts land within the " +
    "documented error bound of the exact counts at sf0.1") {
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def collectProfile(d: org.apache.spark.sql.DataFrame) =
      d.select($"source", $"n_tokens", $"n_terms")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = collectProfile(TextAnalysis.vocabProfile(docs))
    val rsd = 0.05
    val approx = collectProfile(TextAnalysis.vocabProfile(docs, approx = true, rsd = rsd))
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (src, (nTok, nTerms)) =>
      // token totals are an exact count either way — must match exactly
      assert(approx(src)._1 == nTok, s"n_tokens drifted for $src")
      // the sketch estimate: |est - exact| <= 3·rsd · exact (estimates
      // beyond three relative standard deviations are rare by the HLL++
      // error analysis; typical error here is ~rsd)
      val est = approx(src)._2
      assert(math.abs(est - nTerms) <= 3 * rsd * nTerms,
        s"$src: approx n_terms $est vs exact $nTerms exceeds 3·rsd")
    }
  }

  test("oovRate: terms outside the learned top-K vocabulary count as OOV; " +
    "deterministic LIMIT boundary; zero-token docs absent") {
    // corpus: "common" appears 4x, "rare"/"rarer"/"rarest" once each; a
    // vocab of 2 keeps {common, rare} ((count desc, term) order breaks
    // the 1-count tie alphabetically)
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common rarer"),
      (3L, "common rarest"),
      (4L, "...")) // normalizes to no tokens -> absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, vocabSize = 2)
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((3L, 0L, 0.0))) // common, common, rare all in vocab
    assert(got(2L) == ((2L, 1L, 0.5))) // rarer is OOV
    assert(got(3L) == ((2L, 1L, 0.5))) // rarest is OOV
  }

  test("StreamGate: min-kept-value thresholds reproduce the batch rank " +
    "gate exactly (ties included); unseen sources drop") {
    import graft.streaming.StreamGate
    // group g: metrics 0.1, 0.5, 0.5, 0.9 -> pranks 0, 1/3, 1/3, 1; the
    // tie pair shares prank 1/3 < 0.5, so the batch gate keeps only 0.9
    // and the trained threshold is 0.9; group h keeps 0.8 likewise
    val scored = Seq(
      (1L, "g", 0.1), (2L, "g", 0.5), (3L, "g", 0.5), (4L, "g", 0.9),
      (5L, "h", 0.2), (6L, "h", 0.8))
      .toDF("doc_id", "source", "m")
    val thr = StreamGate.rankThresholds(scored, "m")
    val batchKept = TextAnalysis.percentileRank(scored, "m")
      .filter($"prank" >= 0.5).select($"doc_id").as[Long].collect().toSet
    val applied = StreamGate.applyThresholds(scored, thr, "m")
      .select($"doc_id").as[Long].collect().toSet
    assert(applied == batchKept) // exact reproduction, ties and all
    // a doc from a source absent at training time drops conservatively
    val newSource = Seq((9L, "unseen", 0.99)).toDF("doc_id", "source", "m")
    assert(StreamGate.applyThresholds(newSource, thr, "m").count() == 0L)
  }

  test("percentileRank: ANSI (rank-1)/(n-1) with shared ranks on ties") {
    val docs = Seq((1L, "g", 0.1), (2L, "g", 0.5), (3L, "g", 0.5),
      (4L, "g", 0.9), (5L, "solo", 0.7)).toDF("doc_id", "source", "m")
    val ranked = TextAnalysis.percentileRank(docs, "m")
      .orderBy("doc_id").select($"prank").as[Double].collect().toSeq
    // ranks in g: 1, 2, 2, 4 over n=4 → (r-1)/3; single-row group → 0.0
    assert(ranked == Seq(0.0, 1.0 / 3, 1.0 / 3, 1.0, 0.0))
  }

  test("collocations: exact PMI ratios, support floor, tie-break order") {
    val docs = Seq((1L, "new york is big"), (2L, "new york city"),
      (3L, "big city")).toDF("doc_id", "text")
    // N = 9 tokens; c(new)=c(york)=c(big)=c(city)=2, c(is)=1
    // "new york" ×2 → 2·9/(2·2) = 4.5; "york is"/"is big" → 9/2 = 4.5;
    // "york city"/"big city" → 9/4 = 2.25
    val all = TextAnalysis.collocations(docs, k = 10, minCount = 1)
      .select($"gram", $"c_xy", $"score")
      .as[(String, Long, Double)].collect().toSeq
    assert(all == Seq(
      ("is big", 1L, 4.5), ("new york", 2L, 4.5), ("york is", 1L, 4.5),
      ("big city", 1L, 2.25), ("york city", 1L, 2.25)))
    // support floor keeps only the repeated pair
    val sup = TextAnalysis.collocations(docs, k = 10, minCount = 2)
      .select($"gram").as[String].collect().toSeq
    assert(sup == Seq("new york"))
    // a sub-2-word doc contributes no pseudo-gram artifacts
    val short = Seq((1L, "hello"), (2L, "a b")).toDF("doc_id", "text")
    val g = TextAnalysis.collocations(short, k = 10, minCount = 1)
      .select($"gram").as[String].collect().toSeq
    assert(g == Seq("a b"))
  }

  test("retrieveTopK: exact integer rarity weights, rare grams " +
    "dominate, ties break on doc_id, non-overlapping docs absent") {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    // N=3, scale=10: w = 30 div df → shared "alpha beta" (df 2) = 15,
    // unique grams = 30
    val q1 = Seq((100L, "alpha beta gamma")).toDF("qid", "qtext")
    val r1 = TextAnalysis.retrieveTopK(corpus, q1, k = 2, scale = 10L)
      .orderBy($"rank").as[(Long, Long, Long, Int)].collect().toSeq
    // d1 matches both grams (15 + 30 = 45), d2 only the shared one (15),
    // d3 shares nothing and must be ABSENT, not zero-scored
    assert(r1 == Seq((100L, 1L, 45L, 1), (100L, 2L, 15L, 2)))
    // equal scores tie on doc_id
    val q2 = Seq((200L, "alpha beta")).toDF("qid", "qtext")
    val r2 = TextAnalysis.retrieveTopK(corpus, q2, k = 10, scale = 10L)
      .orderBy($"rank").as[(Long, Long, Long, Int)].collect().toSeq
    assert(r2 == Seq((200L, 1L, 15L, 1), (200L, 2L, 15L, 2)))
    intercept[IllegalArgumentException] {
      TextAnalysis.retrieveTopK(corpus, q1, k = 0)
    }
  }

  test("heavyGrams: sketch-gated count equals the plain groupBy — the " +
    "gate drops work, never rows") {
    // "alpha beta" appears 12×, "beta gamma" 3×, the rest once each
    val docs = (1 to 12).map(i => (i.toLong, "alpha beta")) ++
      (13 to 15).map(i => (i.toLong, "beta gamma")) ++
      Seq((16L, "delta epsilon"), (17L, "zeta eta"), (18L, "theta iota"))
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(1L, 2L, 3L, 12L, 13L)) {
      val gated = TextAnalysis.heavyGrams(df, minCount = t)
        .orderBy($"gram").as[(String, Long)].collect().toSeq
      val plain = df
        .select(explode(graft.functions.Dedup.shingles($"text", 2)).as("gram"))
        .groupBy($"gram").agg(count(lit(1)).as("n"))
        .filter($"n" >= t)
        .orderBy($"gram").as[(String, Long)].collect().toSeq
      assert(gated == plain, s"divergence at minCount=$t")
    }
  }

  test("cmsEstimate never undercounts and agrees with the aggregate's " +
    "byte stream; codegen and interpreted paths match") {
    val items = (1 to 50).map(i => s"item${i % 7}").toDF("gram")
    val sketch = TextAnalysis.cmsSketch(items, "gram")
    val exact = items.groupBy($"gram").agg(count(lit(1)).as("n"))
    val est = exact.withColumn("est",
      TextAnalysis.cmsEstimate(sketch, $"gram"))
      .select($"n", $"est").as[(Long, Long)].collect()
    est.foreach { case (n, e) =>
      assert(e >= n, s"CMS undercounted: exact=$n est=$e")
    }
    // interpreted path (eval without codegen) agrees
    import org.apache.spark.sql.GraftSqlShim
    val e = graft.functions.CmsEstimate(
      GraftSqlShim.eagerExpression(lit("item1")), sketch)
    val interp = e.eval(null).asInstanceOf[Long]
    val viaPlan = items.filter($"gram" === "item1")
      .select(TextAnalysis.cmsEstimate(sketch, $"gram")).as[Long].head()
    assert(interp == viaPlan)
    intercept[IllegalArgumentException] {
      TextAnalysis.cmsSketch(items, "gram", eps = 0.0)
    }
  }
}
