package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash/signature/vector kernels.
  *
  * These started as compositions of built-in higher-order functions
  * (`transform`/`aggregate`); those are NOT whole-stage-codegen'd — each
  * lambda step goes through the interpreted `Expression.eval` path, whose
  * virtual call sites turn megamorphic once a session has run a variety of
  * queries, costing up to ~50× on CPU-bound loops (measured: SimHash over
  * sf0.1 went 4.7 s → 240 s within one session). Per the design rule
  * "custom `Expression` with `doGenCode` beats a UDF beats interpreted",
  * each kernel is a tight static JVM loop spliced into generated code via
  * `defineCodeGen` — monomorphic, inlineable, and inside the codegen
  * pipeline, with `nullSafeEval` as the interpreted fallback.
  *
  * Semantics are IDENTICAL to the previous formulations (and to the
  * DuckDB oracle SQL in `graft.queries.Docs`): same constants, same
  * clamped 3-token shingles, same sequential fold order.
  */
object HashImpl {

  val P: Long = 1000000007L

  /** Char-sampling polynomial hash of one token/shingle:
    * (len·2654435761 + 97·first + 31·mid + last) mod P, chars as code
    * points (`ascii`-compatible on the ASCII corpora this targets). */
  def strHash(s: String): Long = {
    val len = s.length
    if (len == 0) return 0L
    val first = s.charAt(0).toLong
    val mid = s.charAt(len / 2).toLong
    val last = s.charAt(len - 1).toLong
    (len.toLong * 2654435761L + first * 97L + mid * 31L + last) % P
  }

  def tokenHashes(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = strHash(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Clamped 3-token shingle hashes: shingle i (1-based, i ≤ max(n−2,1))
    * is "tᵢ tⱼ tₖ" with j = min(i+1, n), k = min(i+2, n). */
  def shingleHashes(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val m = math.max(n - 2, 1)
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ')
        .append(toks(math.min(i + 1, n - 1))).append(' ')
        .append(toks(math.min(i + 2, n - 1)))
      out(i) = strHash(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over token hashes (per-bit ±1 votes, sign → bit).
    * Token hashes are < P < 2³⁰, so a single hash only carries 30 usable
    * bits; the 64 vote bits come from three permutations of the minhash
    * family gₖ(h) = ((2k+1)·h + 7919k) mod P — bit b votes with bit
    * (b mod 30) of g_{b/30}(h). 64 informative bits (vs 30 at the old
    * 32-bit width) keeps the random-collision rate negligible at
    * 100 TB-corpus cardinalities. Mirrored exactly by the DuckDB twin in
    * `graft.queries.Docs.simhashSql`. */
  def simhash64(h: ArrayData): Long = {
    val n = h.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val x = h.getLong(i)
      var k = 0
      while (k < 3) {
        val g = ((2L * k + 1L) * x + 7919L * k) % P
        val base = k * 30
        val width = if (k == 2) 4 else 30
        var j = 0
        while (j < width) {
          if (((g >> j) & 1L) == 1L) votes(base + j) += 1 else votes(base + j) -= 1
          j += 1
        }
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** MinHash signature: k permutations hᵢ(x) = ((2i+1)x + 7919i) mod P. */
  def minhashSig(h: ArrayData, k: Int): ArrayData = {
    val n = h.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 2L * i + 1
      val b = 7919L * i
      var mn = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * h.getLong(j) + b) % P
        if (v < mn) mn = v
        j += 1
      }
      out(i) = mn
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Order-sensitive rolling fingerprint: fold (acc·31 + h) mod P. */
  def fingerprint(h: ArrayData): Long = {
    val n = h.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc = (acc * 31 + h.getLong(i)) % P; i += 1 }
    acc
  }

  /** Sum of code points (the multimodal checksum stub). */
  def asciiChecksum(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    while (i < s.length) { acc += s.charAt(i).toLong; i += 1 }
    acc
  }

  /** Sequential-fold dot product over non-null equal-length arrays (same
    * accumulation order as DuckDB `list_dot_product`). Raw primitive — the
    * expression path goes through [[dotChecked]]. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Null-propagating dot product matching the HOF form
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,v)->acc+v)` EXACTLY:
    * `zip_with` pads a length mismatch with nulls, and one null product
    * poisons the whole fold — so a length mismatch or any null element
    * returns null (boxed), never a silently-truncated sum. */
  def dotChecked(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

case class TokenHashesExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashesExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.shingleHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.minhashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class FingerprintExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.fingerprint(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AsciiChecksumExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ascii_checksum"
  override protected def nullSafeEval(input: Any): Any =
    HashImpl.asciiChecksum(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.asciiChecksum($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<double> inputs")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // Null even for non-null inputs: length mismatch / null element (the
  // same cases where the equivalent HOF fold yields null).
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.dotChecked(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.HashImpl.dotChecked($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
