package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

/** The catalog-level `bucket` function that makes BUCKETED
  * storage-partitioned joins plan: when two manifest tables partitioned
  * by `bucket(N, col)` are joined on the raw column, Spark resolves each
  * side's reported transform through the table catalog's
  * [[org.apache.spark.sql.connector.catalog.FunctionCatalog]] —
  * `V2ExpressionUtils.loadV2FunctionOpt` binds the function named
  * "bucket" with `(numBuckets INT, value)` argument types (the Iceberg
  * system-function shape) — and the two sides SPJ-align iff the bound
  * functions' `canonicalName` match AND the bucket counts agree
  * (`TransformExpression` carries N; mismatched counts correctly fall
  * back to shuffles). The bound functions are REAL [[ScalarFunction]]s
  * computing exactly the writer's routing ([[ManifestSink.bucketOfLong]]
  * / [[ManifestSink.bucketOfStr]]), so any Spark path that re-hashes
  * rows (`spark.sql.sources.v2.bucketing.shuffle.enabled`) agrees with
  * the files' layout by construction.
  *
  * Integral columns share ONE canonical identity ("graft.bucket.int"):
  * INT values hash as 64-bit, so a table bucketed before an INT->BIGINT
  * widening still SPJ-aligns with a natively-BIGINT table — the public
  * Iceberg widening-stability rule.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): murmur3 hash bucket of an INT/BIGINT/STRING column; " +
      "the partition transform bucket(N, col) binds this function for SPJ"
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 ||
        !Set[DataType](IntegerType, LongType).contains(inputType.fields(0).dataType))
      throw new UnsupportedOperationException(
        s"bucket binds (numBuckets INT, value), got ${inputType.simpleString}")
    inputType.fields(1).dataType match {
      case LongType => BucketLong
      case IntegerType => BucketInt
      case StringType => BucketStr
      case other => throw new UnsupportedOperationException(
        s"bucket is defined for BIGINT/INT/STRING values, not ${other.simpleString}")
    }
  }

  private[sources] sealed trait BucketBound extends ScalarFunction[Integer] {
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def isResultNullable: Boolean = false
    override def isDeterministic: Boolean = true
  }
  private[sources] object BucketLong extends BucketBound {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def canonicalName(): String = "graft.bucket.int"
    override def produceResult(input: InternalRow): Integer =
      ManifestSink.bucketOfLong(input.getLong(1), input.getInt(0))
  }
  private[sources] object BucketInt extends BucketBound {
    override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
    // INT hashes as 64-bit — same canonical identity as BucketLong, so
    // pre- and post-widening tables stay SPJ-compatible
    override def canonicalName(): String = "graft.bucket.int"
    override def produceResult(input: InternalRow): Integer =
      ManifestSink.bucketOfLong(input.getInt(1).toLong, input.getInt(0))
  }
  private[sources] object BucketStr extends BucketBound {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def canonicalName(): String = "graft.bucket.str"
    override def produceResult(input: InternalRow): Integer =
      ManifestSink.bucketOfStr(input.getUTF8String(1).toString, input.getInt(0))
  }
}
