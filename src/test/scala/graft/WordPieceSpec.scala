package graft

import graft.functions.WordPiece
import org.scalatest.funsuite.AnyFunSuite

/** The published BERT tokenization algorithm, pinned case by case:
  * basic normalization (lowercase, accent strip, punctuation isolation),
  * greedy longest-prefix wordpiece with ## continuations, UNK fallback,
  * CLS/SEP wrapping and truncation. */
class WordPieceSpec extends AnyFunSuite {

  private val wp = WordPiece.fromTokens(Seq(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "un", "##aff", "##able", "##ix", "run", "##ning", "hello", "world",
    "don", "'", "t", "2", "##0", "over", "##the", "café") ++ // 'café' kept post-accent-strip? no: vocab holds 'cafe' below
    Seq("cafe", "中", "国"))

  test("basic: lowercase, accent strip, punctuation and CJK isolation") {
    assert(WordPiece.basicTokenize("Hello, World!") ==
      Seq("hello", ",", "world", "!"))
    assert(WordPiece.basicTokenize("Café") == Seq("cafe"),
      "NFD + strip combining marks removes the accent")
    assert(WordPiece.basicTokenize("don't") == Seq("don", "'", "t"))
    assert(WordPiece.basicTokenize("a\tb\nc") == Seq("a", "b", "c"))
    assert(WordPiece.basicTokenize("中国rocks") == Seq("中", "国", "rocks"),
      "each CJK ideograph is its own token")
    // supplementary-plane ideograph (U+20000, a surrogate pair): still
    // isolated as ONE token — the tokenizer walks code points, not chars
    val extB = new String(Character.toChars(0x20000))
    assert(WordPiece.basicTokenize(s"ab${extB}cd") == Seq("ab", extB, "cd"),
      "CJK Ext-B ideographs isolate like BMP ones")
    assert(WordPiece.basicTokenize("") == Nil)
  }

  test("wordpiece: greedy longest-prefix with ## continuations; UNK on no cover") {
    assert(wp.wordpiece("unaffable") == Seq("un", "##aff", "##able"))
    assert(wp.wordpiece("running") == Seq("run", "##ning"))
    assert(wp.wordpiece("unfix") == Seq("[UNK]"),
      "no piece covers the 'f' -> the WHOLE word is UNK, never a partial cover")
    assert(wp.wordpiece("hello") == Seq("hello"))
    assert(wp.wordpiece("zzz") == Seq("[UNK]"))
    assert(wp.wordpiece("a" * 101) == Seq("[UNK]"),
      "over-100-char words short-circuit to UNK (BertTokenizer's max_input_chars_per_word)")
  }

  test("published reference vectors (BERT tokenization test suite) over the in-tree vocab artifact") {
    // The PUBLISHED parity cases — the reference vectors from the BERT
    // repo's tokenization test (reproduced in the HF BertTokenizer test
    // suite), run against an in-tree vocab.txt artifact through the real
    // file-loading path, so tokenizer parity is demonstrable in CI
    // without the 90 MB MiniLM model (the env-gated OnnxTransformerSpec
    // end-to-end check remains for WEIGHT parity).
    val ref = WordPiece.fromFile(
      getClass.getResource("/wordpiece_ref_vocab.txt").getPath)
    // FullTokenizer case: lowercase + accent strip + punctuation split +
    // greedy wordpiece, end to end
    assert(ref.tokenize("UNwantéd,running") ==
      Seq("un", "##want", "##ed", ",", "runn", "##ing"))
    assert(ref.tokenize("") == Nil)
    // encode ids are the artifact's line numbers, CLS/SEP-wrapped
    assert(ref.encode("UNwantéd,running").toSeq ==
      Seq(1L, 7L, 4L, 5L, 10L, 8L, 9L, 2L))
    // WordpieceTokenizer cases (published vocab slice, per basic token)
    assert(ref.wordpiece("unwanted") == Seq("un", "##want", "##ed"))
    assert(ref.wordpiece("running") == Seq("runn", "##ing"))
    assert(ref.wordpiece("unwantedx") == Seq("[UNK]"),
      "one uncovered char UNKs the whole word")
    // BasicTokenizer cases
    assert(WordPiece.basicTokenize(" \tHeLLo!how  \n Are yoU?  ") ==
      Seq("hello", "!", "how", "are", "you", "?"))
    assert(WordPiece.basicTokenize("ah博推zz") ==
      Seq("ah", "博", "推", "zz"),
      "CJK ideographs isolate as single tokens")
    assert(WordPiece.basicTokenize("Héllo") == Seq("hello"))
  }

  test("encode: CLS/SEP wrap, id mapping, truncation") {
    val ids = wp.encode("Hello world, don't!")
    // [CLS] hello world , [UNK] ' t ! [SEP] — ',' and '!' are not in vocab -> UNK
    assert(ids.head == 2L && ids.last == 3L)
    assert(ids.toSeq == Seq(2L, 10, 11, 1, 12, 13, 14, 1, 3))
    val t = wp.encode("hello " * 50, maxLen = 8)
    assert(t.length == 8 && t.head == 2L && t.last == 3L,
      "truncation keeps room for CLS and SEP")
  }
}
