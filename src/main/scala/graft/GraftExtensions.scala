package graft

import org.apache.spark.sql.{GraftSqlShim, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{Dedup, Similarity, VecDotF, VecDotI8, VecL2F}

/** Catalyst extension entry point: registers the library's native
  * expressions AND its column-composition kernels with the session so they
  * are usable from SQL text as well as the Column API — a SQL-only user
  * (spark-sql, thrift-server, notebooks) reaches the vector and dedup
  * primitives without touching the Scala API.
  *
  * Wire up with either
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions` (config-driven, works for
  * spark-submit / thrift-server sessions that never touch our Scala API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // MV redirection (graft.plans.MvRewrite): a no-op until a view is
    // registered, gated by spark.graft.mv.rewrite
    ext.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    // SQL UPDATE / MERGE INTO for graft catalog tables: the resolved
    // DML plans route onto the snapshot layer's file-exact
    // copy-on-write verbs (graft.plans.GraftDml)
    ext.injectResolutionRule(_ => graft.plans.GraftDmlRule)
    // governed-face SQL reads (graft.plans.GraftGovernedRead): SELECT
    // over a DV-/mapping-/multi-root-governed snapshot serves the
    // resolved face instead of refusing toward CALL system.optimize
    ext.injectResolutionRule(_ => graft.plans.GraftGovernedReadRule)
    ext.injectPlannerStrategy(_ => graft.plans.GraftDmlStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession

  private def info(name: String, group: String, usage: String,
      className: String = GraftExtensions.getClass.getName): ExpressionInfo =
    new ExpressionInfo(className, null, name, usage,
      "", "", "", group, "0.1.0", "", "scala_udf")

  /** Sizing arguments (signature bits, shingle width, hash seed) shape the
    * expression tree itself, so they must be literals — a column-valued
    * argument has no single tree to build. */
  private def litInt(name: String, arg: String, e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an integer literal, got $other")
  }

  /** Composition kernels (built from `functions._` Columns, not a single
    * Catalyst node) registered by bridging Expression↔Column at the
    * registry boundary; the resulting tree is the same one the Scala API
    * builds, codegen and all. The conversion back must be EAGER — see
    * [[GraftSqlShim.eagerExpression]]. */
  private def col(e: Expression) = GraftSqlShim.column(e)
  private def expr(c: org.apache.spark.sql.Column) =
    GraftSqlShim.eagerExpression(c)

  /** (identifier, info, builder) triples — the same shape
    * `injectFunction` and the live `FunctionRegistry` consume. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        new FunctionIdentifier("vec_dot_f"),
        info("vec_dot_f", "math_funcs",
          "vec_dot_f(a, b) - dot product of two array<float> vectors, " +
            "accumulated left-to-right in double; null on length mismatch " +
            "or null element.", classOf[VecDotF].getName),
        (children: Seq[Expression]) => {
          require(children.length == 2, "vec_dot_f takes exactly 2 arguments")
          VecDotF(children.head, children(1))
        }),
      (
        new FunctionIdentifier("vec_dot_i8"),
        info("vec_dot_i8", "math_funcs",
          "vec_dot_i8(a, b) - exact integer dot product of two " +
            "array<tinyint> vectors as bigint (the int8 ANN inner loop); " +
            "null on length mismatch or null element.",
          classOf[VecDotI8].getName),
        (children: Seq[Expression]) => {
          require(children.length == 2, "vec_dot_i8 takes exactly 2 arguments")
          VecDotI8(children.head, children(1))
        }),
      (
        new FunctionIdentifier("vec_l2_f"),
        info("vec_l2_f", "math_funcs",
          "vec_l2_f(a, b) - squared L2 distance of two array<float> " +
            "vectors, accumulated left-to-right in double; null on length " +
            "mismatch or null element.", classOf[VecL2F].getName),
        (children: Seq[Expression]) => {
          require(children.length == 2, "vec_l2_f takes exactly 2 arguments")
          VecL2F(children.head, children(1))
        }),
      (
        new FunctionIdentifier("parse_description"),
        info("parse_description", "string_funcs",
          "parse_description(desc) - parse a journal item description " +
            "into struct<enumA, enumB, chronI, chronJ, pattern> using the " +
            "ordered multi-pattern grammar; pattern = 'N/A' on no match.",
          classOf[graft.functions.ParseDescription].getName),
        (children: Seq[Expression]) => {
          require(children.length == 1, "parse_description takes 1 argument")
          graft.functions.ParseDescription(children.head)
        }),
      (
        new FunctionIdentifier("simhash"),
        info("simhash", "hash_funcs",
          "simhash(text[, bits]) - bits-wide (default 16, max 63) SimHash " +
            "of the normalized word set as a non-negative bigint; null on " +
            "null text."),
        (children: Seq[Expression]) => {
          require(children.nonEmpty && children.length <= 2,
            "simhash takes 1 or 2 arguments")
          val bits = children.drop(1).headOption
            .map(litInt("simhash", "bits", _)).getOrElse(16)
          expr(Dedup.simhash(col(children.head), bits))
        }),
      (
        new FunctionIdentifier("shingles"),
        info("shingles", "string_funcs",
          "shingles(text[, n]) - array of word n-grams (default n=3) of " +
            "the normalized text; the whole normalized string when it has " +
            "fewer than n words."),
        (children: Seq[Expression]) => {
          require(children.nonEmpty && children.length <= 2,
            "shingles takes 1 or 2 arguments")
          val n = children.drop(1).headOption
            .map(litInt("shingles", "n", _)).getOrElse(3)
          expr(Dedup.shingles(col(children.head), n))
        }),
      (
        new FunctionIdentifier("minhash"),
        info("minhash", "hash_funcs",
          "minhash(shingle_arr, seed) - MinHash of a shingle array under " +
            "the seed-salted md5 hash family: min over md5(s || ':seed')."),
        (children: Seq[Expression]) => {
          require(children.length == 2, "minhash takes exactly 2 arguments")
          expr(Dedup.minhash(col(children.head),
            litInt("minhash", "seed", children(1))))
        }),
      (
        new FunctionIdentifier("vec_quantize_int8"),
        info("vec_quantize_int8", "math_funcs",
          "vec_quantize_int8(v) - symmetric absmax int8 quantization of " +
            "an array<float> vector as struct<q_scale: double, q: " +
            "array<tinyint>>; components floor(x*127/absmax + 0.5) in " +
            "[-127, 127], zero vectors quantize to zeros with scale 0."),
        (children: Seq[Expression]) => {
          require(children.length == 1,
            "vec_quantize_int8 takes exactly 1 argument")
          expr(Similarity.quantizeStruct(col(children.head)))
        }),
      (
        new FunctionIdentifier("hamming_distance"),
        info("hamming_distance", "math_funcs",
          "hamming_distance(a, b) - number of differing bits between two " +
            "bigint values (e.g. simhash signatures)."),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "hamming_distance takes exactly 2 arguments")
          expr(Dedup.hammingDistance(col(children.head), col(children(1))))
        }),
      (
        new FunctionIdentifier("cms_estimate"),
        info("cms_estimate", "hash_funcs",
          "cms_estimate(item, sketch) - count-min-sketch point estimate " +
            "(bigint) of a string item against a BINARY-LITERAL sketch " +
            "built by count_min_sketch(...); estimates never undercount, " +
            "so `cms_estimate(x, sk) >= T` is a no-false-negative heavy-" +
            "hitter gate.", classOf[graft.functions.CmsEstimate].getName),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "cms_estimate takes exactly 2 arguments")
          val bytes = children(1) match {
            case Literal(b: Array[Byte], org.apache.spark.sql.types.BinaryType) => b
            case other => throw new IllegalArgumentException(
              "cms_estimate: sketch must be a binary literal (the bytes " +
                s"ride the plan, as with bloom probes), got $other")
          }
          graft.functions.CmsEstimate(children.head, bytes)
        }),
      (
        new FunctionIdentifier("z_value"),
        info("z_value", "math_funcs",
          "z_value(x, y, bits) - Morton/Z-order interleave of two " +
            "non-negative integer keys reduced mod 2^bits (bits a " +
            "literal in [1, 31]): bit k of x lands at position 2k, bit " +
            "k of y at 2k+1 — the data-layout clustering key that lets " +
            "file min/max statistics prune on either dimension."),
        (children: Seq[Expression]) => {
          require(children.length == 3, "z_value takes exactly 3 arguments")
          val bits = litInt("z_value", "bits", children(2))
          expr(graft.operators.Layout.zValue2(
            col(children.head), col(children(1)), bits))
        }),
      (
        new FunctionIdentifier("hilbert_index"),
        info("hilbert_index", "math_funcs",
          "hilbert_index(keys, bits) - Hilbert-curve index of an " +
            "array<long> of N non-negative keys, each already in " +
            "[0, 2^bits) (bits a literal; N*bits <= 63): consecutive " +
            "indexes are grid-ADJACENT, the locality refinement over " +
            "the Morton interleave that keeps per-file bounding " +
            "rectangles compact as the key count grows."),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "hilbert_index takes exactly 2 arguments")
          val bits = litInt("hilbert_index", "bits", children(1))
          graft.functions.HilbertIndex(children.head, bits)
        }))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
