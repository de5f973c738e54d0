package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a string as a native Catalyst expression: FNV-1a
  * hashes per whitespace token, one signed vote per bit, sign of each
  * vote total becomes the signature bit.
  *
  * Replaces the typed `mapPartitions` kernel (DedupPack.simhash) — the
  * last per-row Scala kernel outside whole-stage codegen: the typed
  * boundary paid an encoder round-trip per document, where this emits
  * one fused byte-walk inside the stage.
  *
  * Token semantics mirror Java `String.split(" ")` on the original
  * kernel exactly, so signatures are bit-identical (DedupSpec pins the
  * hamming-bound behavior): interior empty tokens between consecutive
  * spaces ARE hashed (FNV basis), trailing empty tokens are dropped, and
  * the empty string yields one empty token. Splitting at the 0x20 byte
  * is UTF-8-safe (continuation bytes are >= 0x80).
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var end = b.length
    while (end > 0 && b(end - 1) == 0x20) end -= 1
    val counts = new Array[Int](64)
    if (!(b.length > 0 && end == 0)) { // all-spaces input → zero tokens
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i <= end) {
        if (i == end || b(i) == 0x20) {
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
          h = 0xcbf29ce484222325L
        } else h = (h ^ (b(i) & 0xff)) * 0x100000001b3L
        i += 1
      }
    }
    var sh = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counts = ctx.addMutableState("int[]", "simhashCounts", v => s"$v = new int[64];")
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("bytes")
      val end = ctx.freshName("end")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sh = ctx.freshName("sh")
      s"""
         |byte[] $b = $s.getBytes();
         |int $end = $b.length;
         |while ($end > 0 && $b[$end - 1] == 0x20) $end--;
         |java.util.Arrays.fill($counts, 0);
         |if (!($b.length > 0 && $end == 0)) {
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $i = 0; $i <= $end; $i++) {
         |    if ($i == $end || $b[$i] == 0x20) {
         |      for (int $j = 0; $j < 64; $j++) {
         |        if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |      }
         |      $h = 0xcbf29ce484222325L;
         |    } else {
         |      $h = ($h ^ ($b[$i] & 0xff)) * 0x100000001b3L;
         |    }
         |  }
         |}
         |long $sh = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sh |= (1L << $j);
         |}
         |${ev.value} = $sh;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    Bridge.toColumn(SimHash64Expr(Bridge.toExpression(text)))
}
