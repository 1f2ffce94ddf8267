package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen Catalyst expressions over [[TextHashOps]] kernels. Each emits a
 * single static-dispatch call inside whole-stage codegen (the loop itself is
 * JIT-compiled Scala — no per-element virtual dispatch, no boxing), keeping
 * the dedup/fingerprint pipeline fully codegen'd end to end.
 */
private object TextExprGen {
  /** Fully-qualified codegen reference to the TextHashOps module instance. */
  val Ops = "graft.functions.TextHashOps$.MODULE$"
}

/** poly_hash(STRING) -> BIGINT — rolling polynomial hash mod 1e9+7. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def prettyName: String = "poly_hash"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, s"$prettyName expects STRING")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.polyHash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bpe_count(ARRAY<STRING>) -> BIGINT — total BPE subword tokens of a
  * token array under a fixed merge table ([[BpeOps.countTokensAD]]); the
  * merge arrays ride into codegen as reference objects, so the encode
  * loop runs inside whole-stage codegen with zero per-row setup. */
case class BpeCount(child: Expression, mergesA: Array[String],
                    mergesB: Array[String]) extends UnaryExpression {
  override def prettyName: String = "bpe_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BpeOps.countTokensAD(v.asInstanceOf[ArrayData], mergesA, mergesB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("bpeMergesA", mergesA, "java.lang.String[]")
    val refB = ctx.addReferenceObj("bpeMergesB", mergesB, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeOps$$.MODULE$$.countTokensAD($c, $refA, $refB)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bpe_encode_word(STRING) -> ARRAY<STRING> — one word's BPE symbols. */
case class BpeEncodeWord(child: Expression, mergesA: Array[String],
                         mergesB: Array[String]) extends UnaryExpression {
  override def prettyName: String = "bpe_encode_word"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BpeOps.encodeWordAD(v.asInstanceOf[UTF8String], mergesA, mergesB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("bpeMergesA", mergesA, "java.lang.String[]")
    val refB = ctx.addReferenceObj("bpeMergesB", mergesB, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeOps$$.MODULE$$.encodeWordAD($c, $refA, $refB)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ahash_bands(BINARY) -> ARRAY<BIGINT> — 64-bit perceptual average-hash
  * of a media payload over an 8×8 stub cell grid, as 4 16-bit LSH band
  * values ([[TextHashOps.aHashBands]]). */
case class AHashBands(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ahash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == BinaryType, s"$prettyName expects BINARY")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.aHashBandsAD(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.aHashBandsAD($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** window_hashes(ARRAY<BIGINT>) -> ARRAY<BIGINT> — 64-bit rolling hash of
  * every k-wide window, one pass ([[TextHashOps.windowHashes]]). */
case class WindowHashes(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "window_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.windowHashes(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.windowHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sig(ARRAY<BIGINT>) -> ARRAY<BIGINT> — 12-permutation MinHash
  * signature of a shingle-hash array, single pass over the input. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.minhashSigAD(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.minhashSigAD($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_band_buckets(ARRAY<BIGINT>) -> ARRAY<BIGINT> — MinHash signature
  * folded into its 3 LSH band buckets in a single pass (signature never
  * materialized as a column; see [[TextHashOps.minhashBandBuckets]]). */
case class MinHashBandBuckets(child: Expression) extends UnaryExpression {
  override def prettyName: String = "minhash_band_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.minhashBandBucketsAD(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.minhashBandBucketsAD($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash32(ARRAY<BIGINT>) -> BIGINT — 32-bit SimHash with multiplicity
  * weighting over token hashes. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash32"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.simhash32AD(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.simhash32AD($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hash_embed(ARRAY<STRING>, dim) -> ARRAY<FLOAT> — L2-normalized hashed
  * bag-of-tokens embedding (see [[TextHashOps.hashEmbed]]). */
case class HashEmbed(child: Expression, dim: Int) extends UnaryExpression {
  override def prettyName: String = "hash_embed"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.hashEmbedAD(v.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.hashEmbedAD($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** tokenize(STRING) -> ARRAY<STRING> — lowercased maximal [a-z0-9] runs,
  * bit-identical to `filter(split(lower(trim(s)), "[^a-z0-9]+"), _ != "")`
  * but one compiled char scan instead of a regex engine + interpreted
  * per-element lambda (see [[TextHashOps.tokenize]]). Tokenization leads
  * every text-pipeline query, so this is the hottest scan kernel. */
case class Tokenize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "tokenize"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, s"$prettyName expects STRING")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.tokenize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_hash_set(ARRAY<STRING>, k) -> ARRAY<BIGINT> — fused k-gram
  * rolling-hash set (sorted, distinct); see [[TextHashOps.shingleHashSet]].
  * The dedup family's hottest scan kernel. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "shingle_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.shingleHashSet(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.shingleHashSet($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token_grams(ARRAY<STRING>, k) -> ARRAY<STRING> — ordered space-joined
  * k-grams, duplicates kept, empty when fewer than k tokens (see
  * [[TextHashOps.tokenGrams]]). */
case class TokenGrams(child: Expression, k: Int) extends UnaryExpression {
  override def prettyName: String = "token_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.tokenGrams(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.tokenGrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** term_freq(ARRAY<STRING>, term) -> BIGINT — occurrences of a literal term
  * (the BM25 tf kernel): one compiled scan, vs the interpreted lambda of
  * `size(filter(a, _ === term))`. */
case class TermFreq(child: Expression, term: String) extends UnaryExpression {
  override def prettyName: String = "term_freq"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private lazy val termU = UTF8String.fromString(term)

  override def nullSafeEval(v: Any): Any =
    TextHashOps.countTokenAD(v.asInstanceOf[ArrayData], termU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("term", termU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.countTokenAD($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** clean_text(STRING) -> STRING — one-pass text normalization, identical to
  * `lower(trim(regexp_replace(s, "[^A-Za-z0-9]+", " ")))` (see
  * [[TextHashOps.cleanText]]). */
case class CleanText(child: Expression) extends UnaryExpression {
  override def prettyName: String = "clean_text"
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, s"$prettyName expects STRING")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.cleanText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.cleanText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** count_alpha(STRING) -> BIGINT — [a-z] chars in lower(s); the one-pass
  * replacement for `length(regexp_replace(lower(s), "[^a-z]", ""))` (see
  * [[TextHashOps.countAlpha]]). */
case class CountAlpha(child: Expression) extends UnaryExpression {
  override def prettyName: String = "count_alpha"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    require(child.dataType == StringType, s"$prettyName expects STRING")
    super.checkInputDataTypes()
  }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.countAlpha(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.countAlpha($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** top_token_count(ARRAY<STRING>) -> BIGINT — max token multiplicity via a
  * per-row hash map, O(n) (see [[TextHashOps.topTokenCount]]). */
case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "top_token_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType: a NULL literal argument evaluates to NULL (nullIntolerant)
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.topTokenCount(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.topTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** count_tokens_in(ARRAY<STRING>, terms) -> BIGINT — tokens contained in a
  * small literal term set (stopword-hit kernel). */
case class CountTokensIn(child: Expression, terms: Seq[String]) extends UnaryExpression {
  override def prettyName: String = "count_tokens_in"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType: a NULL literal argument evaluates to NULL (nullIntolerant)
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<STRING>, got ${other.catalogString}")
    }

  private lazy val termsU: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def nullSafeEval(v: Any): Any =
    TextHashOps.countTokensIn(v.asInstanceOf[ArrayData], termsU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termsU,
      classOf[UTF8String].getName + "[]")
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.countTokensIn($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cross_proj(ARRAY<BIGINT> aHash bands) -> ARRAY<BIGINT> — 64 exact
  * integer numerators of the formulaic image→text-space projection (see
  * [[TextHashOps.crossProjNums]]); divide by 4.0 for the shared-space
  * vector. */
case class CrossProj(child: Expression) extends UnaryExpression {
  override def prettyName: String = "cross_proj"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<BIGINT>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.crossProjNums(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.crossProjNums($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bucket_logit(ARRAY<BIGINT>) -> BIGINT — hashed-linear-model inference
  * (see [[TextHashOps.bucketLogit]]): exact integer logit of a quantized
  * hashing-trick classifier over the row's token hashes. The weight table
  * is a plan-static reference object (one `long[]` per codegen'd stage,
  * not a per-row literal), so the whole classifier runs as a single
  * codegen'd scan — the shape model-based quality filtering needs at
  * corpus scale: no shuffle, no explode, no join. */
case class BucketLogit(child: Expression, weights: Seq[Long], bias: Long)
    extends UnaryExpression {
  override def prettyName: String = "bucket_logit"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType: a NULL literal argument evaluates to NULL (nullIntolerant)
      case ArrayType(LongType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<BIGINT>, got ${other.catalogString}")
    }

  private lazy val wArr: Array[Long] = weights.toArray

  override def nullSafeEval(v: Any): Any =
    TextHashOps.bucketLogit(v.asInstanceOf[ArrayData], wArr, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", wArr, "long[]")
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.bucketLogit($c, $ref, ${bias}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token_len_sum(ARRAY<STRING>) -> BIGINT — sum of token char lengths. */
case class TokenLenSum(child: Expression) extends UnaryExpression {
  override def prettyName: String = "token_len_sum"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType: a NULL literal argument evaluates to NULL (nullIntolerant)
      case ArrayType(StringType, _) | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    TextHashOps.tokenLenSum(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.tokenLenSum($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hash_combine(ARRAY<BIGINT>) -> BIGINT — order-sensitive rolling combine
  * (document fingerprint over token hashes). */
case class HashCombine(child: Expression) extends UnaryExpression {
  override def prettyName: String = "hash_combine"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextHashOps.combineAD(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${TextExprGen.Ops}.combineAD($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
