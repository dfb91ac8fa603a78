package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with codegen) for the hash-heavy dedup
  * operators. These replace the explode-based formulations: SimHash drops
  * the 60×-row bit explosion and two aggregations for a single map-side
  * pass; MinHash signatures drop the shingle explode + groupBy. Both stay
  * inside whole-stage codegen via defineCodeGen (an inlined static call),
  * so there is no UDF serialization and no shuffle at all for signature
  * computation. Results are bit-identical to the md5-based composed
  * versions (the DuckDB oracles pin that).
  */
/** Column-API entry points. The expressions are registered as SQL
  * functions by [[graft.GraftExtensions]] (via SparkSessionExtensions —
  * `Tables.sessionConfigs` wires `spark.sql.extensions`), so they are
  * reachable from both `spark.sql` text and the Column API.
  */
object HashExprs {
  import org.apache.spark.sql.functions.{call_function, conv, lit, md5, pmod, substring}

  /** md5-derived deterministic long: the first `hexWidth` hex chars of
    * md5(tagged) read as an unsigned integer — the ONE shared primitive
    * behind every composed hash-bucket/draw expression (feature
    * hashing, count-min cells, negative-sampling draws, sampling
    * buckets/fractions), so a width or base typo can't silently skew
    * one caller's distribution. DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, w) AS BIGINT)`. */
  def md5Long(tagged: Column, hexWidth: Int): Column = {
    require(hexWidth > 0 && hexWidth <= 15, "hexWidth in [1,15] fits a long")
    conv(substring(md5(tagged), 1, hexWidth), 16, 10).cast("long")
  }

  /** [[md5Long]] mod m — a deterministic bucket in [0, m). */
  def md5Mod(tagged: Column, hexWidth: Int, m: Column): Column =
    pmod(md5Long(tagged, hexWidth), m)

  /** 60-bit SimHash of a token array (empty tokens ignored). */
  def simhash60(tokens: Column): Column =
    call_function("simhash60", tokens)

  /** MinHash signature: array of `numHashes` lexicographic-min
    * md5("j:" + shingle) hex strings. Null/empty input → empty array. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    call_function("minhash_sig", shingles, lit(numHashes))
}

/** Shared md5 helpers, callable from generated code (public,
  * static-path addressable, allocation-lean). The digest object is
  * thread-local; min-tracking compares raw 16-byte digests unsigned —
  * identical ordering to comparing lowercase hex strings, without
  * producing them — and hex conversion happens only for the per-document
  * winners. */
object HashImpl {
  private val hexDigits = "0123456789abcdef".toCharArray

  private val localMd5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def md5Hex(bytes: Array[Byte]): String = {
    val md = localMd5.get()
    md.reset()
    toHex(md.digest(bytes))
  }

  /** md5-derived value in [-0.5, 0.5) for a tag — the ONE engine-stable
    * pseudo-random primitive behind the LSH hyperplanes, hash centroids
    * and stub feature vectors. External oracles re-derive it as
    * `conv(md5(tag)[0:6], 16, 10)/2^24 - 0.5`; the constants live only
    * here so Spark and oracle can never desynchronize piecemeal. */
  def hashUnit(tag: Array[Byte]): Double = {
    val hex = md5Hex(tag).substring(0, 6)
    (java.lang.Long.parseLong(hex, 16).toDouble / 16777216.0) - 0.5
  }

  /** Bloom-probe bit position: md5("bloom{i}:" + key) first 15 hex
    * chars mod numBits — the JVM twin of
    * `md5Mod(concat(lit("bloom{i}:"), key), 15, numBits)`, pinned by
    * BloomAgg's differential spec so aggregate-side and Column-side
    * probes can never diverge. */
  def bloomPos(hashIdx: Int, key: String, numBits: Int): Int = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s"bloom$hashIdx:$key".getBytes("UTF-8"))
    (top60(d) % numBits).toInt
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 15 hex chars of the digest as a 60-bit value: big-endian long
    * of the first 8 bytes, dropping the lowest nibble. */
  private def top60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Matches the composed formulation exactly (oracle-pinned): per
    * non-empty token, the first 15 hex chars of md5 are a 60-bit value;
    * each bit votes ±1; result sets bits with positive vote sums. */
  def simhash60(tokens: ArrayData): Long = {
    val md = localMd5.get()
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val tok = tokens.getUTF8String(i)
        if (tok.numBytes() > 0) {
          md.reset()
          val h = top60(md.digest(tok.getBytes))
          var b = 0
          while (b < 60) {
            votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var result = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) result |= (1L << b)
      b += 1
    }
    result
  }

  /** Matches the composed formulation exactly (oracle-pinned):
    * component j is min over shingles of md5Hex("j:" + shingle). */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val md = localMd5.get()
    val prefixes = Array.tabulate(numHashes)(j => (j.toString + ":").getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](numHashes)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val sBytes = shingles.getUTF8String(i).getBytes
        var j = 0
        while (j < numHashes) {
          md.reset()
          md.update(prefixes(j))
          md.update(sBytes)
          val d = md.digest()
          if (mins(j) == null || java.util.Arrays.compareUnsigned(d, mins(j)) < 0)
            mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    if (n == 0 || mins(0) == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(
      mins.map(m => UTF8String.fromString(toHex(m)): Any))
  }
}

case class SimHash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash60"

  protected override def nullSafeEval(input: Any): Any =
    HashImpl.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    HashImpl.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpl.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
