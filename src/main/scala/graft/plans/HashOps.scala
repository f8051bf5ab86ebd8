package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused engine-portable hash prefix:
  * `md5_prefix_long(s, pos, len)` computes the SAME value as the
  * four-expression chain the query surface used everywhere for its
  * portable hash recipe,
  *
  * {{{ conv(substring(md5(s), pos, len), 16, 10).cast("long") }}}
  *
  * i.e. hex chars [pos, pos+len) (1-based, `len` ≤ 15) of the lowercase
  * md5 hex digest, read as an unsigned base-16 integer — but in ONE
  * codegen expression that:
  *
  *  - reuses a per-task-instance `MessageDigest` (the stock `Md5`
  *    expression goes through `DigestUtils.md5Hex`, which calls
  *    `MessageDigest.getInstance("MD5")` — a synchronized provider
  *    lookup — on EVERY row);
  *  - never materializes the 32-char hex string, the substring copy,
  *    or `conv`'s decimal-string round-trip (`conv` renders the value
  *    back to a base-10 STRING which `cast("long")` then re-parses):
  *    the value is read straight out of the digest bytes as nibbles.
  *
  * Value equivalence is pinned by HashOpsSpec against the original
  * expression chain over random inputs for every (pos, len) the repo
  * uses, and by the DuckDB oracle for every consuming query (the
  * oracle SQL still spells the md5/substring recipe — both engines
  * keep computing identical hashes; this fuses the Spark side only).
  *
  * Used by the MinHash/KMV/CMS/reservoir/DSIR/negative-sampling hash
  * sites — per-row to per-shingle volume, the hottest scalar
  * expression family on the board (guide §1.2 step 2: per-task work).
  */
case class Md5PrefixLong(child: Expression, pos: Int, len: Int)
    extends UnaryExpression {
  require(pos >= 1 && len >= 1 && pos + len - 1 <= 32 && len <= 15,
    s"md5_prefix_long: need 1 <= pos, len <= 15, pos+len-1 <= 32; got ($pos, $len)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  // Interpreted path (rare — spec + fallback): thread-local digest.
  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val md = localMd.get()
    md.reset()
    val digest = md.digest(input.asInstanceOf[UTF8String].getBytes)
    Md5PrefixLong.nibbles(digest, pos, len)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One MessageDigest per generated-class INSTANCE (instantiated per
    // task) — thread-confined by construction, no per-row getInstance.
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val dig = ctx.freshName("dig")
      s"""
         |$md.reset();
         |byte[] $dig = $md.digest($in.getBytes());
         |${ev.value} = graft.plans.Md5PrefixLong.nibbles($dig, $pos, $len);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {
  /** Hex chars [pos, pos+len) of the digest's hex rendering, as an
    * unsigned integer — nibble-accurate so odd `pos`/`len` stay exact.
    */
  def nibbles(digest: Array[Byte], pos: Int, len: Int): Long = {
    var acc = 0L
    var i = pos - 1
    val end = pos - 1 + len
    while (i < end) {
      val b = digest(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xf else b & 0xf
      acc = (acc << 4) | nib
      i += 1
    }
    acc
  }
}

/** Both 32-bit halves of the 64-bit md5 prefix in ONE digest:
  * `struct(h1, h2)` where
  * `h1 = conv(substring(md5(s), 1, 8), 16, 10).cast("long")` and
  * `h2 = conv(substring(md5(s), 9, 8), 16, 10).cast("long")` — the
  * Kirsch–Mitzenmacher double-hash family the MinHash/CMS paths draw
  * from. The chain form computed the digest twice wherever common
  * subexpression elimination could not see the sharing (inside
  * higher-order-function lambdas, which evaluate interpreted); this
  * expression digests once everywhere by construction.
  */
case class Md5HashPair(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash_pair requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = true),
    StructField("h2", LongType, nullable = true)))

  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val md = localMd.get()
    md.reset()
    val digest = md.digest(input.asInstanceOf[UTF8String].getBytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](Md5PrefixLong.nibbles(digest, 1, 8),
        Md5PrefixLong.nibbles(digest, 9, 8)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5p",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val dig = ctx.freshName("dig")
      s"""
         |$md.reset();
         |byte[] $dig = $md.digest($in.getBytes());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] {
         |    (Object) graft.plans.Md5PrefixLong.nibbles($dig, 1, 8),
         |    (Object) graft.plans.Md5PrefixLong.nibbles($dig, 9, 8) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5HashPair =
    copy(child = newChild)
}

/** The FULL 128-bit md5 digest as two big-endian signed longs in ONE
  * digest pass: `struct(h1, h2)` where `h1` is digest bytes 0-7 and
  * `h2` bytes 8-15 (two's complement — the raw bit patterns, NOT the
  * unsigned nibble prefixes of [[Md5HashPair]]). Two invariants the
  * consumers lean on, both pinned in HashOpsSpec:
  *
  *  - the lowercase hex digest reconstructs exactly as
  *    `lower(lpad(hex(h1),16,'0') || lpad(hex(h2),16,'0'))`;
  *  - ordering by `(h1 ⊕ Long.MinValue, h2 ⊕ Long.MinValue)` (the
  *    sign-flip that maps unsigned order onto signed order) equals
  *    the lexicographic order of the lowercase hex strings — fixed
  *    width and '0'-'9' < 'a'-'f' make hex order the unsigned
  *    numeric order.
  *
  * This lets an operator whose SEMANTICS are defined over md5 hex
  * strings (winnowing's min-hash selection) sort/compare 16 bytes of
  * longs instead of 32-char strings and materialize the hex only for
  * the selected survivors.
  */
case class Md5FullPair(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_full_pair requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = true),
    StructField("h2", LongType, nullable = true)))

  @transient private lazy val localMd =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val md = localMd.get()
    md.reset()
    val digest = md.digest(input.asInstanceOf[UTF8String].getBytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](Md5FullPair.beLong(digest, 0), Md5FullPair.beLong(digest, 8)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5f",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, in => {
      val dig = ctx.freshName("dig")
      s"""
         |$md.reset();
         |byte[] $dig = $md.digest($in.getBytes());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] {
         |    (Object) graft.plans.Md5FullPair.beLong($dig, 0),
         |    (Object) graft.plans.Md5FullPair.beLong($dig, 8) });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5FullPair =
    copy(child = newChild)
}

object Md5FullPair {
  /** Bytes [off, off+8) of the digest as a big-endian signed long. */
  def beLong(digest: Array[Byte], off: Int): Long = {
    var acc = 0L
    var i = off
    while (i < off + 8) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc
  }
}

/** Column-API entry points for the fused hash expressions. */
object HashOps {
  /** Same value as `conv(substring(md5(s), pos, len), 16, 10).cast("long")`. */
  def md5PrefixLong(s: Column, pos: Int, len: Int): Column =
    GraftColumns.column(Md5PrefixLong(GraftColumns.expression(s), pos, len))

  /** Same values as the (1,8)/(9,8) md5-prefix pair, one digest:
    * `struct(h1 long, h2 long)`.
    */
  def md5Pair(s: Column): Column =
    GraftColumns.column(Md5HashPair(GraftColumns.expression(s)))

  /** The full digest as two big-endian signed longs, one digest pass:
    * `struct(h1 long, h2 long)` — see [[Md5FullPair]] for the hex
    * round-trip and ordering invariants.
    */
  def md5FullPair(s: Column): Column =
    GraftColumns.column(Md5FullPair(GraftColumns.expression(s)))
}
