package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 56-bit SimHash of a string as a native Catalyst expression: md5 per
  * whitespace token, one signed vote per bit of the digest's first 56
  * bits, sign of each vote total becomes the signature bit.
  *
  * The token hash is md5's first 14 hex digits — the SAME portable
  * integer both engines compute identically that the MinHash permutation
  * family bakes on (`'0x' || substr(md5(tok), 1, 14)` in DuckDB), which
  * is what lets q_dedup_simhash graduate from rows-only to a hash-exact
  * DuckDB oracle (the pre-r10 64-bit FNV-1a byte fold had no SQL
  * counterpart because no fixed-iteration unroll covers variable-length
  * tokens).
  *
  * Token semantics are DuckDB's `string_split(text, ' ')` exactly: EVERY
  * 0x20-delimited segment is hashed, including interior AND trailing
  * empties, and the empty string yields one empty token (Scala mirror:
  * `split(" ", -1)`). Splitting at the 0x20 byte is UTF-8-safe
  * (continuation bytes are >= 0x80).
  *
  * Still one codegen'd pass per document — the md5 is a per-token static
  * call into a thread-local digest (no per-row allocation beyond the
  * digest's own), not a UDF boundary; at corpus scale the expression
  * rides the scan stage like every other row-local function.
  */
case class SimHash56Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash56"

  override protected def nullSafeEval(input: Any): Any =
    SimHash56.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash56.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash56Expr =
    copy(child = newChild)
}

object SimHash56 {
  val Bits = 56

  private val state = new ThreadLocal[(MessageDigest, Array[Byte], Array[Int])] {
    override def initialValue(): (MessageDigest, Array[Byte], Array[Int]) =
      (MessageDigest.getInstance("MD5"), new Array[Byte](16), new Array[Int](Bits))
  }

  /** First 56 bits of md5 over `b[from, from+len)` — the integer DuckDB
    * spells `('0x' || substr(md5(tok), 1, 14))::BIGINT`.
    */
  def hash56(md: MessageDigest, out: Array[Byte], b: Array[Byte], from: Int, len: Int): Long = {
    md.reset()
    md.update(b, from, len)
    md.digest(out, 0, 16)
    ((out(0) & 0xffL) << 48) | ((out(1) & 0xffL) << 40) | ((out(2) & 0xffL) << 32) |
      ((out(3) & 0xffL) << 24) | ((out(4) & 0xffL) << 16) | ((out(5) & 0xffL) << 8) |
      (out(6) & 0xffL)
  }

  def simhash(s: UTF8String): Long = {
    val (md, buf, counts) = state.get()
    java.util.Arrays.fill(counts, 0)
    val b = s.getBytes
    val n = b.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        val h = hash56(md, buf, b, start, i - start)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < Bits) { if (counts(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }

  def apply(text: Column): Column =
    Bridge.toColumn(SimHash56Expr(Bridge.toExpression(text)))
}
