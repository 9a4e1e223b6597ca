package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression: `ngrams_gen(tokens, n)` emits one
  * `(pos, gram)` row per n-token shingle of an `array<string>` column
  * (1-based position, tokens joined by a single space) — the engine's
  * shingling primitive as a native Catalyst GENERATOR, completing the
  * custom-expression ladder (scalar codegen `CosineUnits`, typed
  * `Aggregator`, optimizer `Rule`, planner strategy + exec, DSv2
  * source/sink — and now the generator kind, SQL-usable via
  * `LATERAL VIEW ngrams_gen(ts, 3) g AS pos, gram`).
  *
  * Why not keep the `transform(sequence(...))` idiom everywhere: that
  * shape first MATERIALIZES an array of n·L characters per doc (every
  * shingle string boxed into an intermediate array) and then explodes
  * it; the generator streams one row at a time out of the doc's token
  * array with no intermediate collection, which is the difference
  * between O(doc) extra allocation per row and O(1) in the explode hot
  * path. Rows shorter than n produce nothing (the transform idiom's
  * `sequence(1, size-n+1)` DESCENDS when size < n and must be guarded
  * separately every time — the generator encapsulates the edge once).
  *
  * `n` must be a positive integer literal (checked at bind time — a
  * per-row n would defeat the analyzer's output-schema contract).
  */
case class NGramsGen(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  private val nVal: Int = n match {
    case Literal(v: Int, IntegerType) if v >= 1 => v
    case other =>
      throw new IllegalArgumentException(
        s"ngrams_gen(tokens, n): n must be a positive INT literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams_gen needs array<string> tokens, got $t")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) return Iterator.empty
    val toks = arr.asInstanceOf[ArrayData]
    val len = toks.numElements()
    if (len < nVal) return Iterator.empty
    val space = UTF8String.fromString(" ")
    (0 to len - nVal).iterator.map { i =>
      val parts = new Array[UTF8String](2 * nVal - 1)
      var j = 0
      while (j < nVal) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < nVal - 1) parts(2 * j + 1) = space
        j += 1
      }
      InternalRow(i + 1, UTF8String.concat(parts: _*))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGen =
    copy(child = newChildren(0), n = newChildren(1))
}
