package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
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

object DeflateRatio {
  /** Level 6 (zlib default), raw stream (nowrap): no header/checksum
    * bytes, so short inputs aren't dominated by framing.
    */
  private val LEVEL = 6

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(LEVEL, true)
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
