package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus-scale pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - Signatures (minhash / simhash / fingerprints) are computed per-row
  *    with array expressions — `transform`/`aggregate`/`array_min` over the
  *    token list — so signature generation is a narrow, shuffle-free,
  *    codegen'd map. No explode: a 1k-token document never becomes 1k rows.
  *  - Candidate generation shuffles only (key, doc_id) pairs, never text:
  *    LSH band buckets (minhash) or blocking keys (jaccard) keep the
  *    pairwise comparison bounded per bucket instead of O(n²) global.
  *  - Hashes are md5-hex-string based: deterministic, seedable by suffix,
  *    portable across engines (used by the DuckDB oracle), and min() over
  *    hex strings is a valid uniform min-hash order.
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Fingerprint groups: one hash aggregation (map-side partial, then one
    * shuffle on the 128-bit key) with group size and survivor id. */
  def fingerprintGroups(df: DataFrame, textCol: String = "text"): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))

  /** Exact duplicate groups only (size > 1). */
  def exactDuplicates(df: DataFrame, textCol: String = "text"): DataFrame =
    fingerprintGroups(df, textCol).filter(col("n_dups") > 1)

  /** Keep one representative per fingerprint (the min doc_id): the
    * dropDuplicates analog with a deterministic survivor. */
  def exactDedup(df: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col("doc_id"))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Word n-gram shingles of the normalized text, as an array column
    * (pure array expression, no explode). */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = TextAnalysis.words(text)
    when(size(ws) < n, array(TextAnalysis.normalize(text)))
      .otherwise(
        transform(
          sequence(lit(0), size(ws) - n),
          i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  /** One minhash value: the minimum md5 hex digest over the shingle set,
    * salted by `seed`. min over uniformly-hashed values = classic minhash;
    * hex strings order like their 128-bit values. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(s, lit(":" + seed)))))

  /** k-permutation minhash signature as k columns `mh0..mh{k-1}`. */
  def withMinhashSignature(
      df: DataFrame,
      textCol: String = "text",
      k: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    val withSh = df.withColumn("__sh", shingles(col(textCol), shingleSize))
    (0 until k).foldLeft(withSh) { (d, i) =>
      d.withColumn(s"mh$i", minhash(col("__sh"), i))
    }.drop("__sh")
  }

  /** LSH candidate pairs: band the k-signature into `bands` groups of
    * `k/bands` rows, bucket-join on (band index, band hash). Only doc ids
    * and band hashes shuffle; each bucket yields its pairs. Output:
    * (doc_a < doc_b) distinct candidate pairs. */
  def minhashCandidates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      k: Int = 8,
      bands: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rowsPerBand = k / bands
    val sig = withMinhashSignature(df, textCol, k, shingleSize)
      .select((col(idCol) +: (0 until k).map(i => col(s"mh$i"))): _*)
    // band hash = md5 of the concatenated band rows
    val banded = sig.select(
      col(idCol),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          md5(concat_ws("|",
            (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col("band"), col("bucket"), col(idCol).as("doc_a"))
    val r = banded.select(col("band"), col("bucket"), col(idCol).as("doc_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** `bits`-bit SimHash over the word set, as a per-row array expression:
    * bit b is the sign of Σ_tokens (±1 by the b-th hex digit's high bit of
    * md5(token)). No shuffle; one pass. */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits <= 32, "md5 hex supplies 32 digit positions")
    val ws = TextAnalysis.words(text)
    val perBit = transform(
      sequence(lit(0), lit(bits - 1)),
      b => {
        val vote = aggregate(
          ws,
          lit(0),
          (acc, w) =>
            acc + when(md5(w).substr(b + 1, lit(1)) >= "8", 1).otherwise(-1))
        when(vote > 0, pow(lit(2), b).cast("int")).otherwise(lit(0))
      })
    aggregate(perBit, lit(0), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash ints (for near-dup thresholds). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: exact-match blocking on the simhash
    * value itself (identical signatures), the cheapest useful variant —
    * one aggregation, no cross join. */
  def simhashDuplicates(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      bits: Int = 16): DataFrame =
    df.select(col(idCol), simhash(col(textCol), bits).as("sh"))
      .groupBy("sh")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .filter(col("n_docs") > 1)

  // ------------------------------------------------------------------
  // N-gram Jaccard
  // ------------------------------------------------------------------

  /** Jaccard similarity of two (already distinct) string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(lit(0.0))
  }

  /** Word-bigram Jaccard near-dups, blocked on `blockCol` so the pairwise
    * stage is per-bucket, not global O(n²). At cluster scale the blocking
    * key would be an LSH band; any low-cardinality prefilter works. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      blockCol: String = "source",
      n: Int = 2,
      threshold: Double = 0.25): DataFrame = {
    val grams = array_distinct(shingles(col(textCol), n))
    val prep = df.select(col(blockCol).as("blk"), col(idCol), grams.as("g"))
    val l = prep.select(col("blk"), col(idCol).as("doc_a"), col("g").as("ga"))
    val r = prep.select(col("blk"), col(idCol).as("doc_b"), col("g").as("gb"))
    l.join(r, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("ga"), col("gb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
