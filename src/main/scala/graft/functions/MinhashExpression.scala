package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash LSH signature over a text column: tokenize on
  * single spaces, build k-gram shingles, md5 each shingle once, track
  * the per-band minimum 8-hex chunk of the digest — all in a single
  * traversal with no intermediate Catalyst arrays.
  *
  * Bit-identical to the declarative formulation
  * (graft.api.Graft.minhashSignatureHof: split / transform / md5 /
  * substring / array_min) and to the DuckDB oracle — verified
  * differentially in LlmOpsSpec. Eval-based (CodegenFallback): the
  * md5 calls dominate, so interpreted dispatch around them is noise,
  * while skipping the per-shingle UTF8String array materialization is
  * the actual win.
  */
case class MinhashSignature(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private val k = 3
  private val bands = 4

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_minhash_sig"

  // MessageDigest is stateful; expressions may be shared across local
  // tasks, so keep one instance per thread.
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): Array[Char] = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any = {
    val text = a.asInstanceOf[UTF8String].toString
    val md = digests.get()
    // split(" ", -1) ≡ Spark's split(text, " ") for the single-space
    // regex (keeps empty trailing fields)
    val words = text.split(" ", -1)
    val mins = Array.ofDim[Char](bands, 8)
    var first = true
    def consume(shingle: String): Unit = {
      val hex = md5Hex(md, shingle)
      var b = 0
      while (b < bands) {
        var cmp = 0
        var j = 0
        if (first) cmp = -1
        else {
          while (cmp == 0 && j < 8) {
            cmp = Character.compare(hex(8 * b + j), mins(b)(j))
            j += 1
          }
        }
        if (cmp < 0) System.arraycopy(hex, 8 * b, mins(b), 0, 8)
        b += 1
      }
      first = false
    }
    if (words.length >= k) {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + k <= words.length) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1)).append(' ').append(words(i + 2))
        consume(sb.toString)
        i += 1
      }
    } else {
      consume(text)
    }
    val out = new java.lang.StringBuilder(bands * 9 - 1)
    var b = 0
    while (b < bands) {
      if (b > 0) out.append(':')
      out.append(mins(b), 0, 8)
      b += 1
    }
    UTF8String.fromString(out.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
