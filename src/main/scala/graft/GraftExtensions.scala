package graft

import graft.functions.{CharEntropy, CosineSim, IndelSim, JaroWinklerPpm, KmvAgg, LshSig, MinHashAgg, MinHashSig, ShingleStrings, SimHash64, SortedIntersectCount, TopKCountAgg, WinnowMins}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftsql.Bridge

/** Registers graft's native expressions as SQL functions, so pure-SQL
  * users (spark.sql / thrift / notebooks) get the same kernels as the
  * Scala API:
  *
  *   spark.sql("SELECT minhash_sig(shingle_strings(toks, 3), 128) ...")
  *
  * Enable at build time with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or on a live session with GraftExtensions.register(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in"),
        builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  /** (name, usage, builder) for every exposed function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("minhash_sig", "_FUNC_(shingles, n) - n-permutation MinHash signature of a string array",
      (args: Seq[Expression]) => MinHashSig(args(0), intArg(args(1), "numHashes"))),
    ("winnow_mins", "_FUNC_(hashes, w) - sorted distinct sliding-window minima (winnowing)",
      (args: Seq[Expression]) => WinnowMins(args(0), intArg(args(1), "window"))),
    ("cosine_sim", "_FUNC_(a, b) - cosine similarity of two float/double arrays",
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("lsh_sig", "_FUNC_(vec, planes) - random-hyperplane LSH signature",
      (args: Seq[Expression]) => LshSig(args(0), intArg(args(1), "nPlanes"))),
    ("shingle_strings", "_FUNC_(tokens, k) - space-joined k-shingles of a token array",
      (args: Seq[Expression]) => ShingleStrings(args(0), intArg(args(1), "k"))),
    ("simhash64", "_FUNC_(tokens) - 64-bit tf-weighted SimHash of a token array",
      (args: Seq[Expression]) => SimHash64(args(0))),
    ("sorted_intersect_count", "_FUNC_(a, b) - |a intersect b| for sorted long arrays",
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("indel_sim", "_FUNC_(a, b) - indel similarity 2*LCS/(|a|+|b|) (rapidfuzz ratio)",
      (args: Seq[Expression]) => IndelSim(args(0), args(1))),
    ("minhash_agg", "_FUNC_(value, n) - n-component MinHash sketch of the group's distinct values",
      (args: Seq[Expression]) => MinHashAgg(args(0), intArg(args(1), "numHashes"))),
    ("kmv_agg", "_FUNC_(value, k) - KMV bottom-k sketch: the k smallest distinct sign-flipped xxh64 hashes, sorted",
      (args: Seq[Expression]) => KmvAgg(args(0), intArg(args(1), "k"))),
    ("char_entropy", "_FUNC_(text) - Shannon entropy (nats) of the code-point distribution",
      (args: Seq[Expression]) => CharEntropy(args(0))),
    ("topk_by_count", "_FUNC_(n, key, k) - exact bounded top-k (count, key) entries of the group, best first (feed finalized counts)",
      (args: Seq[Expression]) => TopKCountAgg(args(0), args(1), intArg(args(2), "k"))),
    ("jaro_winkler_ppm", "_FUNC_(a, b) - Jaro-Winkler similarity in integer ppm over UTF-8 bytes (the rapidfuzz unit)",
      (args: Seq[Expression]) => JaroWinklerPpm(args(0), args(1))))

  /** Register every function into an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      Bridge.registerFunction(spark, name, usage, builder)
    }
}
