package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership test over a string column.
  *
  * The filter is built ONCE (distributed treeAggregate over the small
  * side — see [[BloomFunctions.buildFilter]]), serialized into the
  * expression, and shipped to executors with the stage's task binary —
  * the same mechanism that ships [[HyperplaneBucket]]'s plane matrix. A
  * bloom filter of n items at fpp p is ~1.44·n·log2(1/p) BITS regardless
  * of item length, so a benchmark eval-set of a million 8-token shingles
  * rides along as ~1.2 MB where a broadcast hash join would materialize
  * the full ~60 MB of strings per executor.
  *
  * Guarantee: NO false negatives — a `false` verdict is definitive, a
  * `true` verdict is confirmed by an exact equi-join afterwards (the
  * c24/c27 contract). Insertion and probe both hash the UTF-8 bytes of
  * the string, so the two sides agree by construction.
  */
case class BloomMightContain(child: Expression,
                             filterBytes: scala.collection.immutable.ArraySeq[Byte])
    extends UnaryExpression {
  // filterBytes is an ArraySeq (value equality), not Array (reference
  // equality): case-class equals/hashCode drive Catalyst canonicalization
  // and subexpression elimination, and a raw array would make two
  // identical filter expressions compare unequal — each carrying its own
  // multi-hundred-KB copy through the plan

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes.toArray))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bf = ctx.addReferenceObj("bloom", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainBinary($a.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column-API entry points for the bloom membership expression. */
object BloomFunctions {

  /** Build a [[BloomFilter]] over a string column with a distributed
    * treeAggregate — partial filters are built per partition and OR-merged
    * up a tree, so the driver receives O(log partitions) fixed-size
    * sketches, never the rows. `expectedItems` sizes the bit array; an
    * undersized filter degrades fpp (more exact-verify work downstream)
    * but never correctness. */
  def buildFilter(df: DataFrame, colName: String,
                  expectedItems: Long, fpp: Double): Array[Byte] = {
    val rdd = df.select(org.apache.spark.sql.functions.col(colName).cast("string"))
      .queryExecution.toRdd
    val bf = rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      (f, row) => {
        if (!row.isNullAt(0)) f.putBinary(row.getUTF8String(0).getBytes)
        f
      },
      (a, b) => a.mergeInPlace(b))
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership-test column: true iff `c` may be in the filter (no false
    * negatives; false positives bounded by the build fpp). */
  def mightContain(c: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(c.cast("string")),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(filterBytes)))
}
