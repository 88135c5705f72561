package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash of a string, sign-bit masked — the reference's task
  * routing hash (`ihash`, reference: src/mr/worker.go:26-30: fnv.New32a,
  * `int(h.Sum32() & 0x7fffffff)`).
  *
  * Implemented as a native Catalyst expression WITH codegen (not a Scala
  * UDF) so it stays inside whole-stage codegen — the preferred extension
  * path for scalar functions this engine adds beyond Spark's builtins.
  * Only needed when byte-identical bucket routing parity with the
  * reference matters (it doesn't for results — the reference's own tests
  * sort-concatenate all buckets; SURVEY.md §2.1 E3).
  */
case class Fnv1a(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv1a requires string input, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a =
    copy(child = newChild)
}

object Fnv1a {
  /** FNV-1a 64-bit over a string's UTF-8 bytes — the fast deterministic
    * base hash for MinHash shingles (public FNV parameters). */
  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = h ^ (bytes(i) & 0xffL)
      h = h * 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a 32-bit over raw UTF-8 bytes, sign bit cleared (matches Go's
    * `h.Sum32() & 0x7fffffff` on the same byte sequence). */
  def hash(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5 // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h = h ^ (bytes(i) & 0xff)
      h = h * 0x01000193 // FNV prime
      i += 1
    }
    h & 0x7fffffff
  }

  /** Column API: `fnv1a($"key")`. */
  def fnv1a(c: Column): Column =
    GraftBridge.column(Fnv1a(GraftBridge.expression(c)))
}
