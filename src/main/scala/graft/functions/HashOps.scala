package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash kernels for the dedup/fingerprint hot paths.
  *
  * Semantics are EXACTLY `conv(substring(md5(s), 1, 15), 16, 10)` — the
  * top 60 bits of the md5 digest as a non-negative long — which the
  * DuckDB oracles mirror as `CAST('0x' || substr(md5(x),1,15) AS
  * BIGINT)`. The built-in composition allocates a 32-char hex string,
  * a substring, and a base-conversion parse per call; for per-gram
  * hashing (one call per character position of every document) that
  * dominated q15/q17/q24. These kernels hash straight from the UTF-8
  * bytes into the long, reuse a thread-local digest, and emit all gram
  * hashes of a document in a single pass returning one primitive long
  * array — no per-gram object churn, still inside whole-stage codegen.
  */
object HashOps {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of a 16-byte md5 digest (= first 15 hex chars). */
  private def top60(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4

  def md5Prefix60(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    top60(md.digest())
  }

  def md5Prefix60(s: UTF8String): Long = {
    val b = s.getBytes
    md5Prefix60(b, 0, b.length)
  }

  /** 60-bit hashes of every char n-gram of `s`, in position order.
    * Matches `transform(sequence(1, length(s)-(n-1)), i ->
    * hash60(substr(s, i, n)))`. ASCII fast path slices the byte array
    * in place; multi-byte text falls back to per-position `substringSQL`
    * (chars, not bytes — the SQL semantics both engines use).
    */
  def gramHash60(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    val m = math.max(nChars - n + 1, 0)
    val arr = new Array[Long](m)
    if (bytes.length == nChars) {
      var i = 0
      while (i < m) { arr(i) = md5Prefix60(bytes, i, n); i += 1 }
    } else {
      var i = 0
      while (i < m) {
        val gb = s.substringSQL(i + 1, n).getBytes
        arr(i) = md5Prefix60(gb, 0, gb.length)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** 60-bit hashes of every word k-gram shingle (words joined by a
    * single space), in position order — the digest is fed word bytes +
    * `' '` separators directly, byte-identical to hashing
    * `concat_ws(" ", w_i … w_{i+k-1})`.
    */
  def shingleHash60(ws: ArrayData, k: Int): ArrayData = {
    val n = ws.numElements()
    val m = math.max(n - k + 1, 0)
    val md = digests.get()
    val arr = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(ws.getUTF8String(i + j).getBytes)
        j += 1
      }
      arr(i) = top60(md.digest())
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(arr)
  }

  /** Content-defined chunking of a word array, one linear pass: word i
    * (1-based) ends a chunk iff `i = n` or (`3 <= i < n` and the hash
    * of the 3-gram ENDING at i ≡ 0 (mod `mod`)). Returns one
    * `struct(ci, s, len, h)` per chunk — 0-based chunk index, 1-based
    * inclusive start, word count, and the 60-bit identity hash. The
    * identity digest is fed word bytes + `' '` separators directly, so
    * `h` is byte-identical to `md5_prefix60(array_join(slice(ws, s,
    * len), ' '))` — the chunk hash the DuckDB oracle computes — with
    * no chunk string ever built.
    *
    * This exists as ONE kernel (boundaries + hashes together) because
    * the equivalent higher-order-function pipeline is a Catalyst trap:
    * CollapseProject inlines the shingle-hash array into the boundary
    * lambda, re-evaluating a whole-document md5 pass PER ELEMENT
    * (quadratic — measured 25x the cost of this pass at sf0.1), and
    * `InferFiltersFromGenerate` then duplicates that expression into a
    * Filter. A single codegen'd expression gives the optimizer nothing
    * to inline or re-derive.
    */
  def cdcChunks60(ws: ArrayData, mod: Int): ArrayData = {
    val n = ws.numElements()
    val md = digests.get()
    // hash of the 3-gram ending at word i (1-based i >= 3): sh(i - 3)
    // 0-based, same values as shingleHash60(ws, 3)
    val m = math.max(n - 2, 0)
    val sh = new Array[Long](m)
    var j = 0
    while (j < m) {
      md.reset()
      var t = 0
      while (t < 3) {
        if (t > 0) md.update(' '.toByte)
        md.update(ws.getUTF8String(j + t).getBytes)
        t += 1
      }
      sh(j) = top60(md.digest())
      j += 1
    }
    val out = new java.util.ArrayList[Any]()
    var lo = 0 // 0-based exclusive chunk start (= previous bound)
    var i = 1
    var ci = 0L
    while (i <= n) {
      if (i == n || (i >= 3 && sh(i - 3) % mod == 0)) {
        md.reset()
        var w = lo
        while (w < i) {
          if (w > lo) md.update(' '.toByte)
          md.update(ws.getUTF8String(w).getBytes)
          w += 1
        }
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](ci, lo + 1, i - lo, top60(md.digest()))))
        ci += 1
        lo = i
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** `md5_prefix60(s)` — 60-bit md5-prefix hash of a string. */
  def md5_prefix60(s: Column): Column =
    Shim.column(Md5Prefix60Expr(Shim.expression(s)))

  /** `gram_hash60(s, n)` — hashes of all char n-grams, one pass. */
  def gram_hash60(s: Column, n: Int): Column =
    Shim.column(GramHash60Expr(Shim.expression(s), n))

  /** `shingle_hash60(ws, k)` — hashes of all word k-gram shingles. */
  def shingle_hash60(ws: Column, k: Int): Column =
    Shim.column(ShingleHash60Expr(Shim.expression(ws), k))

  /** `cdc_chunks60(ws, mod)` — content-defined chunk spans + identity
    * hashes, one linear pass.
    */
  def cdc_chunks60(ws: Column, mod: Int): Column =
    Shim.column(CdcChunks60Expr(Shim.expression(ws), mod))
}

case class Md5Prefix60Expr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(s: Any): Any =
    HashOps.md5Prefix60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.md5Prefix60($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class GramHash60Expr(child: Expression, n: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash60"

  override protected def nullSafeEval(s: Any): Any =
    HashOps.gramHash60(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.gramHash60($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class CdcChunks60Expr(child: Expression, mod: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ci", LongType, nullable = false),
    StructField("s", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks60"

  override protected def nullSafeEval(ws: Any): Any =
    HashOps.cdcChunks60(ws.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.cdcChunks60($c, $mod)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class ShingleHash60Expr(child: Expression, k: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[Shim.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash60"

  override protected def nullSafeEval(ws: Any): Any =
    HashOps.shingleHash60(ws.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.shingleHash60($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
