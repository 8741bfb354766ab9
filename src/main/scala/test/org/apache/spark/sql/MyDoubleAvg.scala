package test.org.apache.spark.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.{MutableAggregationBuffer, UserDefinedAggregateFunction}
import org.apache.spark.sql.types._

/** Re-implementation of Apache Spark's public test UDAF of the same
  * fully-qualified name (spark: sql/core/src/test/java/test/org/apache/
  * spark/sql/MyDoubleAvg.java), whose semantics the reference's
  * `udaf.sql` golden battery pins via
  * `CREATE FUNCTION default.myDoubleAvg AS 'test.org.apache.spark.sql.MyDoubleAvg'`
  * (reference: core/src/test/resources/sql-tests/inputs/udaf.sql). The
  * FQCN must match for the battery's CREATE FUNCTION to resolve, so this
  * lives outside the graft namespace; it is test support, not library
  * surface. Semantics: average of the non-null inputs plus 100.0. */
class MyDoubleAvg extends UserDefinedAggregateFunction {
  override def inputSchema: StructType =
    StructType(StructField("inputDouble", DoubleType) :: Nil)

  override def bufferSchema: StructType = StructType(
    StructField("bufferSum", DoubleType) ::
      StructField("bufferCount", LongType) :: Nil)

  override def dataType: DataType = DoubleType
  override def deterministic: Boolean = true

  override def initialize(buffer: MutableAggregationBuffer): Unit = {
    buffer.update(0, null)
    buffer.update(1, 0L)
  }

  override def update(buffer: MutableAggregationBuffer, input: Row): Unit =
    if (!input.isNullAt(0)) {
      val sum = if (buffer.isNullAt(0)) 0.0 else buffer.getDouble(0)
      buffer.update(0, sum + input.getDouble(0))
      buffer.update(1, buffer.getLong(1) + 1L)
    }

  override def merge(b1: MutableAggregationBuffer, b2: Row): Unit =
    if (!b2.isNullAt(0)) {
      val sum = if (b1.isNullAt(0)) 0.0 else b1.getDouble(0)
      b1.update(0, sum + b2.getDouble(0))
      b1.update(1, b1.getLong(1) + b2.getLong(1))
    }

  override def evaluate(buffer: Row): Any =
    if (buffer.isNullAt(0)) null
    else 100.0 + buffer.getDouble(0) / buffer.getLong(1)
}
