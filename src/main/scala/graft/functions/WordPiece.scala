package graft.functions

/**
 * BERT tokenization — the front half of the reference's embedder
 * (all-MiniLM-L6-v2, /root/reference/src/embeddings.py:3, which ships a
 * WordPiece `vocab.txt`). Two standard stages, implemented to the
 * published algorithm (Devlin et al. 2018; the HF `BertTokenizer`
 * semantics with `do_lower_case=true`):
 *
 *  1. BASIC: NFD-normalize and strip combining marks (accent removal),
 *     lowercase, drop control chars, surround CJK ideographs and
 *     punctuation with spaces, split on whitespace.
 *  2. WORDPIECE: greedy longest-prefix-first match against the vocab;
 *     non-initial pieces carry the `##` continuation prefix; a word with
 *     no decomposition (or longer than 100 chars — BertTokenizer's
 *     max_input_chars_per_word) becomes `[UNK]`.
 *
 * `encode` wraps the pieces in `[CLS] ... [SEP]` and maps to ids — the
 * exact input contract of a BERT-family ONNX export
 * ([[OnnxTransformerEmbedder]] feeds these as `input_ids`).
 */
final class WordPiece(vocab: Map[String, Long]) {
  require(vocab.contains(WordPiece.Unk), s"vocab must contain ${WordPiece.Unk}")

  /** Greedy sub-word split of one basic token (already lowercased).
    * The over-long cutoff is 100 chars — BertTokenizer's
    * max_input_chars_per_word, so 100+-char junk tokens become [UNK]
    * exactly like the reference pipeline. */
  def wordpiece(word: String): Seq[String] = {
    if (word.isEmpty) return Nil
    if (word.length > 100) return Seq(WordPiece.Unk)
    val pieces = Seq.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var hit: String = null
      while (end > start && hit == null) {
        val cand = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Seq(WordPiece.Unk)
      pieces += hit
      start = end
    }
    pieces.result()
  }

  /** Basic + wordpiece over a raw text. */
  def tokenize(text: String): Seq[String] =
    WordPiece.basicTokenize(text).flatMap(wordpiece)

  /** `[CLS] pieces [SEP]` as vocab ids, truncated to `maxLen` total. */
  def encode(text: String, maxLen: Int = 512): Array[Long] = {
    val body = tokenize(text).take(maxLen - 2)
    (WordPiece.Cls +: body :+ WordPiece.Sep)
      .map(t => vocab.getOrElse(t, vocab(WordPiece.Unk))).toArray
  }
}

object WordPiece {
  val Unk = "[UNK]"
  val Cls = "[CLS]"
  val Sep = "[SEP]"

  /** Load a `vocab.txt` (one token per line, id = line number). */
  def fromFile(path: String): WordPiece = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromTokens(src.getLines().toSeq) finally src.close()
  }

  def fromTokens(tokens: Seq[String]): WordPiece =
    new WordPiece(tokens.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap)

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x20000 && cp <= 0x2A6DF)

  /** BERT's punctuation class: ASCII symbol ranges plus Unicode P*. */
  private def isPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
        val t = Character.getType(cp)
        t == Character.DASH_PUNCTUATION || t == Character.START_PUNCTUATION ||
          t == Character.END_PUNCTUATION || t == Character.CONNECTOR_PUNCTUATION ||
          t == Character.OTHER_PUNCTUATION || t == Character.INITIAL_QUOTE_PUNCTUATION ||
          t == Character.FINAL_QUOTE_PUNCTUATION
      }

  /** Lowercase, strip accents (NFD + drop Mn), isolate punctuation and
    * CJK ideographs, split on whitespace. Iterates CODE POINTS, not
    * chars — a supplementary-plane ideograph (CJK Ext-B) arrives as a
    * surrogate pair and must still be isolated as one token. */
  def basicTokenize(text: String): Seq[String] = {
    val nfd = java.text.Normalizer.normalize(text.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length + 16)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) () // strip accent
      else if (Character.isWhitespace(cp)) sb.append(' ') // incl. \t \n \r
      else if (Character.isISOControl(cp)) ()
      else if (isPunct(cp) || isCjk(cp)) {
        sb.append(' '); sb.appendCodePoint(cp); sb.append(' ')
      }
      else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString.split("\\s+").toSeq.filter(_.nonEmpty)
  }
}
