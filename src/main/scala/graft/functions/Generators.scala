package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom [[Generator]] (UDTF surface — SURVEY §2.10: the reference row-falls
  * back all of GenerateExec, docs/operators.md #6; we extend it instead):
  * splits a document into fixed-size word chunks — the context-window
  * chunking step of a training-data pipeline. Emits (chunk_idx, chunk) rows,
  * 1-based index, chunks of `n` space-separated words (last chunk ragged).
  * An optional `stride` < n slides the window with `n - stride` words of
  * overlap between consecutive chunks (context-window overlap); chunks
  * start at every multiple of the stride below the word count.
  *
  * Split semantics are literal single-space with trailing empties kept,
  * matching DuckDB `str_split(text, ' ')` for the oracle.
  */
case class WordChunks(child: Expression, n: Int, stride: Int = 0)
  extends Generator with CodegenFallback {
  // stride 0 = "no overlap" (stride == n); stride < n overlaps chunks by
  // n - stride words — the sliding context window of a training pipeline
  private val step = if (stride <= 0) n else stride

  require(n > 0, "word_chunks chunk size must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "word_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_chunks requires a string column, got ${child.dataType.sql}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val words = v.toString.split(" ", -1)
      val m = (words.length + step - 1) / step
      (0 until m).iterator.map { i =>
        val start = i * step
        val chunk = words.slice(start, math.min(start + n, words.length))
          .mkString(" ")
        InternalRow(i + 1, UTF8String.fromString(chunk))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordChunks =
    copy(child = newChildren.head)
}
