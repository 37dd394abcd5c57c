package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-style subword tokenization (SURVEY.md §2.10 / round-3 verdict
  * item #4): greedy longest-match against a fixed subword vocabulary,
  * so "token counts" in the corpus operators can mean model tokens
  * rather than whitespace words.
  *
  * This is the INFERENCE side of BPE (apply a trained vocabulary),
  * which is what a data pipeline runs at scale — merge-training
  * happens once, offline. The vocabulary here is a deterministic
  * built-in demo set (common English subwords, lengths 2–4, single
  * characters as the implicit fallback); a production deployment
  * swaps [[BpeVocab.pieces]] for the model tokenizer's vocab file.
  * Matching is greedy longest-match-first (4 → 3 → 2 → one code
  * point), the classic WordPiece-style linear-scan approximation of
  * BPE merges — deterministic and, critically, expressible as a
  * finite recursive CTE in the DuckDB oracle over the SAME inlined
  * vocabulary, so the counts are differentially checkable.
  *
  * Unicode contract: the single-character fallback advances one CODE
  * POINT (not one UTF-16 unit), matching DuckDB's character
  * semantics for substr/len — a word of emoji yields one token per
  * emoji in both engines.
  */
object BpeVocab {

  /** Demo vocabulary: high-frequency English subwords, lengths 2–4.
    * ASCII-only by construction (inlined into oracle SQL literals). */
  val pieces: Seq[String] = Seq(
    // length 4
    "tion", "atio", "that", "ther", "with", "ment", "ions", "this",
    "here", "from", "ould", "ting", "hich", "ence", "have", "ight",
    // length 3
    "the", "ing", "and", "ion", "ent", "for", "ati", "ter", "ate",
    "con", "res", "ver", "all", "ons", "men", "ted", "ers", "pro",
    "are", "ess", "not", "ive", "was", "ect", "com", "per", "int",
    "est", "sta", "ist", "ear", "ain", "one", "our", "iti",
    // length 2
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur")

  require(pieces.distinct.size == pieces.size, "duplicate vocab piece")
  require(pieces.forall(p => p.length >= 2 && p.length <= 4 && p.forall(c => c < 128)),
    "pieces must be ASCII, lengths 2-4")

  private val byLen: Array[Set[String]] = {
    val a = Array.fill(5)(Set.empty[String])
    pieces.groupBy(_.length).foreach { case (l, ps) => a(l) = ps.toSet }
    a
  }

  /** Greedy longest-match token count for one WORD. */
  private def countWord(w: String, from: Int, to: Int): Long = {
    var i = from
    var n = 0L
    while (i < to) {
      var step = 0
      var l = 4
      while (l >= 2 && step == 0) {
        if (i + l <= to && byLen(l).contains(w.substring(i, i + l))) step = l
        l -= 1
      }
      if (step == 0) step = Character.charCount(w.codePointAt(i)) // one code point
      i += step
      n += 1L
    }
    n
  }

  /** The subword pieces of one WORD, in scan order. */
  private def piecesOfWord(w: String, from: Int, to: Int,
                           out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    var i = from
    while (i < to) {
      var step = 0
      var l = 4
      while (l >= 2 && step == 0) {
        if (i + l <= to && byLen(l).contains(w.substring(i, i + l))) step = l
        l -= 1
      }
      if (step == 0) step = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + step)
      i += step
    }
  }

  /** Full segmentation of a TEXT: every subword piece in text order
    * (spaces are separators, not pieces). `countTokens` is its
    * length — kept separate so counting never allocates. */
  def tokenize(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        piecesOfWord(text, start, i, out)
        start = i + 1
      }
      i += 1
    }
    out.toSeq
  }

  /** Token count for a whole TEXT: single-space word split (the
    * corpus contract, same as Graft.tokens), words tokenized
    * independently — BPE merges never cross word boundaries. */
  def countTokens(text: String): Long = {
    var n = 0L
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        n += countWord(text, start, i)
        start = i + 1
      }
      i += 1
    }
    n
  }

  /** The greedy-match step as DuckDB SQL: longest piece matching at
    * character position `pos` of `word`, else 1 (one character —
    * DuckDB substr/len are code-point-based, matching countWord). */
  def stepSql(word: String, pos: String): String = {
    def inList(l: Int): String =
      pieces.filter(_.length == l).map(p => s"'$p'").mkString(", ")
    s"""CASE WHEN substr($word, $pos, 4) IN (${inList(4)}) THEN 4
       |     WHEN substr($word, $pos, 3) IN (${inList(3)}) THEN 3
       |     WHEN substr($word, $pos, 2) IN (${inList(2)}) THEN 2
       |     ELSE 1 END""".stripMargin
  }
}

/** `graft_bpe_count(text)` — per-row subword token count over the
  * whole text: a single variable-stride greedy scan, no intermediate
  * arrays. Codegen emits a call through a referenced counter object
  * (ctx.addReferenceObj), so the expression stays INSIDE the
  * whole-stage-codegen span — a CodegenFallback here would split the
  * generated loop of any projection/aggregation built over it. */
case class BpeTokenCount(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BpeVocab.countTokens(input.asInstanceOf[UTF8String].toString)

  // Janino-friendly indirection: generated Java calls a plain method
  // on this expression instance (Scala object MODULE$ access is not)
  def count(s: UTF8String): Long = BpeVocab.countTokens(s.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCounter", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** `graft_bpe_pieces(text)` — the full subword segmentation as
  * array<string>, for chunking/packing stages that need the pieces
  * themselves rather than the count. Same greedy scan, same codegen
  * shape as [[BpeTokenCount]]. */
case class BpeTokenPieces(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_pieces"
  override def nullable: Boolean = true

  def pieces(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BpeVocab.tokenize(s.toString).map(UTF8String.fromString).toArray[Any])

  override protected def nullSafeEval(input: Any): Any =
    pieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenizer", this, classOf[BpeTokenPieces].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pieces($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenPieces =
    copy(child = newChild)
}

object BpeFunctions {
  val bpeCountInfo = (
    new FunctionIdentifier("graft_bpe_count"),
    new ExpressionInfo(classOf[BpeTokenCount].getName, "graft_bpe_count"),
    (children: Seq[Expression]) => BpeTokenCount(children.head))

  val bpePiecesInfo = (
    new FunctionIdentifier("graft_bpe_pieces"),
    new ExpressionInfo(classOf[BpeTokenPieces].getName, "graft_bpe_pieces"),
    (children: Seq[Expression]) => BpeTokenPieces(children.head))
}
