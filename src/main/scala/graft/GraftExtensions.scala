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
    // every builder checks its arity up front: a wrong-argument-count call
    // gets a clear analysis error naming the signature, not an
    // IndexOutOfBounds / NoSuchElement from es(i)
    def inject(name: String, arity: Int, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), { es: Seq[Expression] =>
        if (es.length != arity)
          throw new IllegalArgumentException(
            s"$name expects exactly $arity argument(s) — $usage — got ${es.length}")
        builder(es)
      }))

    inject("cosine_sim", 2, "cosine_sim(a, b) - cosine similarity of two float vectors") {
      es => CosineSimilarity(es(0), es(1))
    }
    inject("l2_sq", 2, "l2_sq(a, b) - squared euclidean distance") {
      es => L2SquaredDistance(es(0), es(1))
    }
    inject("dot_product", 2, "dot_product(a, b) - inner product") {
      es => DotProduct(es(0), es(1))
    }
    inject("vec_norm", 1, "vec_norm(a) - L2 norm")(es => VectorNorm(es.head))
    inject("poly_hash", 1, "poly_hash(s) - rolling polynomial hash mod 1e9+7") {
      es => PolyHash(es.head)
    }
    inject("simhash32", 1, "simhash32(hashes) - 32-bit SimHash")(es => SimHash32(es.head))
    inject("minhash_sig", 1, "minhash_sig(hashes) - 12-permutation MinHash signature") {
      es => MinHashSig(es.head)
    }
    inject("hash_combine", 1, "hash_combine(hashes) - rolling combine of a hash array") {
      es => HashCombine(es.head)
    }
    inject("tokenize", 1, "tokenize(s) - lowercased alphanumeric tokens") {
      es => Tokenize(es.head)
    }
    inject("clean_text", 1, "clean_text(s) - collapse non-alnum runs, trim, lowercase") {
      es => CleanText(es.head)
    }
    inject("count_alpha", 1, "count_alpha(s) - [a-z] chars in lower(s)") {
      es => CountAlpha(es.head)
    }
    inject("top_token_count", 1, "top_token_count(toks) - max token multiplicity") {
      es => TopTokenCount(es.head)
    }
    inject("token_len_sum", 1, "token_len_sum(toks) - summed token lengths") {
      es => TokenLenSum(es.head)
    }
    inject("term_freq", 2, "term_freq(toks, 'term') - occurrences of a literal term") { es =>
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
