package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 56-bit dHash-class perceptual hash as a native Catalyst expression —
  * the codegen'd form of `graft.operators.Multimodal.perceptualHash`'s
  * brightness-grid/gradient construction (7 x 9 cells, each the integer
  * sum of 8 sampled character codepoints striding the whole item;
  * bit(r, c) = cell(r, c) < cell(r, c + 1)).
  *
  * Semantics are EXACTLY the original composed-builtin form
  * `sum ascii(substr(text, cast(1 + j*n/504.0 as int), 1))`, which is
  * also the DuckDB mirror's `ascii(substring(text, 1 + (j*n)//504, 1))`:
  * positions and lengths are CODEPOINT-indexed (UTF8String.numChars) and
  * the sampled value is the full Unicode codepoint (measured identical on
  * Spark and DuckDB up to 4-byte astral codepoints: ascii('😀') = 128512
  * on both). The double-division form and the integer `//` form agree
  * because j*n <= 503*len << 2^53 keeps the quotient either exactly
  * representable or >= 1/504 away from the next integer (see the
  * Multimodal scaladoc), so the kernel uses exact long division.
  *
  * Why native: the nested transform/aggregate HOF original fell out of
  * whole-stage codegen into interpreted CodegenFallback at ~1.3 ms/doc —
  * 504 interpreted substr+ascii calls per row (the same failure mode the
  * r14 streaming-signature rebase root-caused). This kernel walks the
  * UTF-8 bytes ONCE per document (sample positions are nondecreasing in
  * the sample index, so each codepoint decodes at most once) and rides
  * the scan stage's codegen like every other row-local function.
  */
case class PHash56Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "phash56"

  override protected def nullSafeEval(input: Any): Any =
    PHash56.phash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PHash56.phash($c)")

  override protected def withNewChildInternal(newChild: Expression): PHash56Expr =
    copy(child = newChild)
}

object PHash56 {
  val Samples = 504 // 63 cells x 8 samples
  val Cells = 63    // 7 rows x 9 cols

  private val state = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](Cells)
  }

  def phash(s: UTF8String): Long = {
    val cells = state.get()
    java.util.Arrays.fill(cells, 0L)
    val n = s.numChars().toLong
    if (n > 0L) {
      val b = s.getBytes
      // position of sample t is 1 + t*n/504 (1-based codepoint index,
      // exact long division == the builtin form's double division; see
      // scaladoc). Nondecreasing in t -> one forward UTF-8 walk, each
      // codepoint decoded at most once. pos <= n always for n >= 1.
      var t = 0
      var byteI = 0
      var charPos = 0 // 1-based index of the most recently decoded codepoint
      var cp = 0      // that codepoint's value
      while (t < Samples) {
        val pos = (1L + t * n / Samples).toInt
        while (charPos < pos) {
          // Truncation guard (valid UTF-8 never hits it: numChars counts
          // leading bytes, so charPos reaches pos before byteI can run
          // past the buffer). A malformed/truncated sequence — e.g. a
          // binary-to-string cast — degrades to codepoint 0 instead of
          // an ArrayIndexOutOfBoundsException, mirroring how the
          // composed substr/ascii builtin form degrades gracefully.
          if (byteI >= b.length) { cp = 0; charPos += 1 }
          else {
            val b0 = b(byteI) & 0xff
            val width =
              if (b0 < 0x80) 1 else if (b0 < 0xe0) 2 else if (b0 < 0xf0) 3 else 4
            if (byteI + width > b.length) { cp = 0; byteI = b.length }
            else if (width == 1) { cp = b0; byteI += 1 }
            else if (width == 2) {
              cp = ((b0 & 0x1f) << 6) | (b(byteI + 1) & 0x3f); byteI += 2
            } else if (width == 3) {
              cp = ((b0 & 0x0f) << 12) | ((b(byteI + 1) & 0x3f) << 6) |
                (b(byteI + 2) & 0x3f); byteI += 3
            } else {
              cp = ((b0 & 0x07) << 18) | ((b(byteI + 1) & 0x3f) << 12) |
                ((b(byteI + 2) & 0x3f) << 6) | (b(byteI + 3) & 0x3f); byteI += 4
            }
            charPos += 1
          }
        }
        cells(t >> 3) += cp
        t += 1
      }
    }
    // bit b compares cell k1 = (b/8)*9 + b%8 against its right neighbor
    var h = 0L
    var bit = 0
    while (bit < 56) {
      val k1 = (bit >> 3) * 9 + (bit & 7)
      if (cells(k1) < cells(k1 + 1)) h |= (1L << bit)
      bit += 1
    }
    h
  }

  def apply(text: Column): Column =
    Bridge.toColumn(PHash56Expr(Bridge.toExpression(text)))
}
