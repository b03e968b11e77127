package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's custom expressions.
  *
  * Production path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * at session build (or `.withExtensions(new GraftExtensions)`) — every
  * session then resolves `poly_hash`, `word_shingles`, `shingle_fps`,
  * `simhash48`, `minhash_sig`, `float_dot` in plain SQL, so a SQL-only
  * user gets the fused signature pipeline without the Scala API.
  * Existing sessions (tests, notebooks) use
  * [[GraftExtensions.registerAll]], which installs the same builders on
  * the live function registry.
  *
  * Literal-argument extraction mirrors Spark's own builders (e.g.
  * `round`): the size/mod arguments must be foldable integers, checked
  * at analysis with a clear error rather than at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer argument, got $other")
  }
  private def longArg(name: String, e: Expression): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer argument, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every SQL-exposed expression. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("poly_hash",
      info("poly_hash", "poly_hash(str, mod) - 31-ary code-point fold modulo mod"),
      { case Seq(s, m) => PolyHash(s, longArg("poly_hash", m))
        case args => throw new IllegalArgumentException(
          s"poly_hash(str, mod) takes 2 arguments, got ${args.length}") }),
    ("word_shingles",
      info("word_shingles", "word_shingles(tokens, k) - k-word shingle strings"),
      { case Seq(t, k) => WordShingles(t, intArg("word_shingles", k))
        case args => throw new IllegalArgumentException(
          s"word_shingles(tokens, k) takes 2 arguments, got ${args.length}") }),
    ("shingle_fps",
      info("shingle_fps", "shingle_fps(tokens, k) - windowed 40-bit shingle fingerprints"),
      { case Seq(t, k) => ShingleFps(t, intArg("shingle_fps", k))
        case args => throw new IllegalArgumentException(
          s"shingle_fps(tokens, k) takes 2 arguments, got ${args.length}") }),
    ("simhash48",
      info("simhash48", "simhash48(tokens) - mixed 48-bit majority signature"),
      { case Seq(t) => SimHash48(t)
        case args => throw new IllegalArgumentException(
          s"simhash48(tokens) takes 1 argument, got ${args.length}") }),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingle_hashes, n) - n-minima MinHash signature"),
      { case Seq(t, n) => MinHashSig(t, intArg("minhash_sig", n))
        case args => throw new IllegalArgumentException(
          s"minhash_sig(hashes, n) takes 2 arguments, got ${args.length}") }),
    ("float_dot",
      info("float_dot", "float_dot(a, b) - sequential-accumulation dot product"),
      { case Seq(a, b) => FloatVectorDot(a, b)
        case args => throw new IllegalArgumentException(
          s"float_dot(a, b) takes 2 arguments, got ${args.length}") }))

  /** Install on a LIVE session's registry (the extensions path only runs
    * at session construction). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graft.FunctionShim.register(spark, name, i, builder)
    }
}
