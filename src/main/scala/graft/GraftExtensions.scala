package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers the engine's Catalyst
 * expressions as SQL functions at session build time —
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `builder.withExtensions(new GraftExtensions)`) makes
 * `cosine_sim`, `l2_sq`, `dot_product`, `vec_norm`, `poly_hash`,
 * `simhash32`, `minhash_sig`, `hash_combine`, `tokenize` available to plain
 * SQL without per-session `registerAll` calls.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors") {
      es => CosineSimilarity(es(0), es(1))
    }
    inject("l2_sq", "l2_sq(a, b) - squared euclidean distance") {
      es => L2SquaredDistance(es(0), es(1))
    }
    inject("dot_product", "dot_product(a, b) - inner product") {
      es => DotProduct(es(0), es(1))
    }
    inject("vec_norm", "vec_norm(a) - L2 norm")(es => VectorNorm(es.head))
    inject("poly_hash", "poly_hash(s) - rolling polynomial hash mod 1e9+7") {
      es => PolyHash(es.head)
    }
    inject("simhash32", "simhash32(hashes) - 32-bit SimHash")(es => SimHash32(es.head))
    inject("minhash_sig", "minhash_sig(hashes) - 12-permutation MinHash signature") {
      es => MinHashSig(es.head)
    }
    inject("hash_combine", "hash_combine(hashes) - rolling combine of a hash array") {
      es => HashCombine(es.head)
    }
    inject("tokenize", "tokenize(s) - lowercased alphanumeric tokens") {
      es => Tokenize(es.head)
    }
    inject("clean_text", "clean_text(s) - collapse non-alnum runs, trim, lowercase") {
      es => CleanText(es.head)
    }
    inject("count_alpha", "count_alpha(s) - [a-z] chars in lower(s)") {
      es => CountAlpha(es.head)
    }
    inject("top_token_count", "top_token_count(toks) - max token multiplicity") {
      es => TopTokenCount(es.head)
    }
    inject("token_len_sum", "token_len_sum(toks) - summed token lengths") {
      es => TokenLenSum(es.head)
    }
    inject("term_freq", "term_freq(toks, 'term') - occurrences of a literal term") { es =>
      if (es.length != 2)
        throw new IllegalArgumentException(
          s"term_freq expects exactly 2 arguments (toks ARRAY<STRING>, term STRING literal); got ${es.length}")
      // fold constant expressions (e.g. upper('a')) before requiring a literal
      val term = es(1) match {
        case e if e.foldable => e.eval(null)
        case _ => null
      }
      term match {
        case s: org.apache.spark.unsafe.types.UTF8String => TermFreq(es(0), s.toString)
        case _ =>
          throw new IllegalArgumentException(
            "term_freq expects a foldable string term as its second argument")
      }
    }
  }
}
