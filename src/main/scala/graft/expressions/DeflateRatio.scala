package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native compression-ratio quality signal: `deflate(text).length /
  * utf8(text).length`. Highly repetitive text (boilerplate, generated
  * spam, stuck decoder loops) compresses far below natural prose, so the
  * ratio is a standard corpus-quality gate (used alongside the Gopher
  * rules; cf. the repetition heuristics of Rae et al. 2021 — this is the
  * codec-based variant most curation stacks add).
  *
  * An Expression rather than a UDF: the hot loop stays inside
  * whole-stage codegen (no boxing, no Scala-function call per row), and
  * the per-thread `Deflater` is reused across rows — a UDF closure would
  * allocate one per call or force synchronization.
  *
  * Determinism: DEFLATE output for a fixed input, level, and strategy is
  * deterministic for a given zlib build; the JDK pins its own zlib, so
  * the value is stable across runs and partitionings on one JVM line —
  * pinned by golden hash, not a SQL oracle (DuckDB has no deflate).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.DeflateRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Exact DEFLATE level-0 (stored-mode) output length of the UTF-8 text,
  * in bytes — the engine-replayable face of the deflate tier. Stored
  * blocks have a closed-form size (`len + 5 × max(1, ⌈len/65535⌉)`:
  * 5-byte block header per ≤65535-byte block, one final empty block for
  * empty input), so the whole Deflater pipeline — UTF-8 byte extraction,
  * reset/setInput/finish, the drain loop, length accounting — produces
  * an integer a SQL oracle can recompute, independent of any zlib
  * Huffman decisions (`q_deflate_evidence`). The level-6 ratio
  * ([[DeflateRatio]]) has no such form and stays golden-pinned.
  */
case class DeflateStoredLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "deflate_stored_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatio.storedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.DeflateRatio.storedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateStoredLen =
    copy(child = newChild)
}

object DeflateRatio {
  /** Level 6 (zlib default), raw stream (nowrap): no header/checksum
    * bytes, so short inputs aren't dominated by framing.
    */
  private val LEVEL = 6

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(LEVEL, true)
  }

  private val stored = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.NO_COMPRESSION, true)
  }

  /** Reusable output buffer for [[storedLen]] — grown to the stored-mode
    * bound per input. zlib's stored-block CHUNKING follows the output
    * space it is offered (a small drain buffer yields small blocks), so
    * the deflate must be one-shot into a buffer that fits the whole
    * result for the closed form to hold.
    */
  private val storedBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** Level-0 raw-deflate output length — runs the REAL codec, one-shot
    * into a bound-sized buffer, so the output length is the stored-block
    * closed form `n + 5·max(1, ⌈n/65535⌉)` exactly (spec-asserted in
    * DeflateRatioSpec, oracle-replayed in q_deflate_evidence).
    */
  def storedLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = stored.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val bound = bytes.length + 5 * (bytes.length / 65535 + 1) + 16
    var buf = storedBuf.get()
    if (buf.length < bound) {
      buf = new Array[Byte](Integer.highestOneBit(bound - 1) << 1)
      storedBuf.set(buf)
    }
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Compressed-to-raw byte ratio; empty input defines to 1.0. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}
