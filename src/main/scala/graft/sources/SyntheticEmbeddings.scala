package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 read path (SURVEY §2.1 sources, the custom-source
  * rung): an unbounded deterministic corpus of synthetic embeddings,
  * generated in parallel partitions instead of read from files — the
  * harness for ANN/dedup testing at ANY scale without materializing
  * 100 TB first.
  *
  *   spark.read.format("graft.sources.SyntheticEmbeddings")
  *     .option("rows", 1000000).option("dim", 64)
  *     .option("numPartitions", 32).option("seed", 42).load()
  *
  * Scale/operator contracts demonstrated (and asserted in
  * DataSourceV2Spec):
  *   - COLUMN PRUNING (SupportsPushDownRequiredColumns): a query that
  *     never touches `embedding` never pays vector generation — the
  *     pruned schema reaches the reader, not just the projection.
  *   - FILTER PUSHDOWN (SupportsPushDownFilters): vec_id range
  *     predicates narrow the generated [start, end) per partition, so
  *     `WHERE vec_id < k` generates k rows, not `rows` rows.
  *   - PARALLELISM: `numPartitions` input partitions, each an
  *     independent id range — the multi-executor layout.
  *   - DETERMINISM: element (seed, vec_id, pos) → splitmix64 → float in
  *     [-1, 1); a retried task regenerates identical data (the same
  *     retry-stability rule as q82's md5 sampling — rand() would break
  *     exactly-once downstream).
  */
class SyntheticEmbeddings extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEmbeddings.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticEmbeddings {
  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  private[sources] val labels =
    Array("alpha", "beta", "gamma", "delta", "epsilon")

  /** splitmix64 — public-domain mix (Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA 2014). */
  private[sources] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private[sources] def element(seed: Long, vecId: Long, pos: Int): Float = {
    val h = mix(mix(seed ^ vecId) ^ pos)
    // top 24 bits → [-1, 1)
    ((h >>> 40).toInt / 8388608.0f) - 1.0f
  }
}

private class SyntheticTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "synthetic_embeddings"
  override def schema(): StructType = SyntheticEmbeddings.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(
      rows = o.getLong("rows", options.getLong("rows", 1000L)),
      dim = o.getInt("dim", options.getInt("dim", 64)),
      seed = o.getLong("seed", options.getLong("seed", 42L)),
      numPartitions =
        o.getInt("numPartitions", options.getInt("numPartitions", 8)))
}

private class SyntheticScanBuilder(rows: Long, dim: Int, seed: Long,
                                   numPartitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var required: StructType = SyntheticEmbeddings.schema
  private var lo = 0L          // inclusive vec_id lower bound
  private var hi = rows        // exclusive vec_id upper bound
  private var pushed = Array.empty[Filter]
  private var countStar = false

  /** LIMIT n over a pure id range is exact: clip the range. Declaring the
    * push complete (isPartiallyPushed=false) lets Spark drop the limit
    * operator entirely. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit); true
  }
  override def isPartiallyPushed: Boolean = false

  /** COUNT(*) with no grouping is metadata: the range length. The scan
    * flips to a one-row aggregate answer — zero rows generated, the
    * stats-based-answer pattern a 100 TB scan must exploit. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (supportCompletePushDown(agg)) { countStar = true; true } else false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("vec_id", _: Long) => true
      case GreaterThan("vec_id", _: Long) => true
      case GreaterThanOrEqual("vec_id", _: Long) => true
      case LessThan("vec_id", _: Long) => true
      case LessThanOrEqual("vec_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("vec_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("vec_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("vec_id", v: Long) => lo = math.max(lo, v)
      case LessThan("vec_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("vec_id", v: Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = accepted
    // the bounds are EXACT for these filters — nothing left to re-check,
    // so none of the accepted filters need post-scan evaluation
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countStar)
      new CountStarScan(math.max(0L, math.max(hi, lo) - math.max(lo, 0L)))
    else
      new SyntheticScan(required, math.max(lo, 0L), math.max(hi, lo), dim,
        seed, numPartitions, pushed)
}

/** The completely-pushed COUNT(*): one partition, one row, no data. */
private class CountStarScan(count: Long) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"SyntheticEmbeddings agg=count_star($count)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new CountStarReaderFactory(count)
}

/** Scala SAM lambdas are not Serializable — reader factories ship to
  * executors, so this must be a concrete class. */
private class CountStarReaderFactory(count: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow(count)
      override def close(): Unit = ()
    }
}

private class SyntheticScan(required: StructType, lo: Long, hi: Long,
                            dim: Int, seed: Long, numPartitions: Int,
                            pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaces the pushed state in `explain` (BatchScan description)
  override def description(): String =
    s"SyntheticEmbeddings range=[$lo,$hi) dim=$dim " +
      s"pushed=[${pushed.mkString(",")}] columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, numPartitions)
    val total = math.max(0L, hi - lo)
    (0 until n).map { i =>
      val s = lo + total * i / n
      val e = lo + total * (i + 1) / n
      SyntheticPartition(s, e): InputPartition
    }.filter { case SyntheticPartition(s, e) => e > s }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required, dim, seed)
}

private case class SyntheticPartition(start: Long, end: Long)
    extends InputPartition

private class SyntheticReaderFactory(required: StructType, dim: Int,
                                     seed: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.start - 1
      override def next(): Boolean = { id += 1; id < sp.end }
      override def get(): InternalRow = {
        val vals = required.fieldNames.map {
          case "vec_id" => id
          case "label" =>
            val ix = math.floorMod(SyntheticEmbeddings.mix(seed ^ id),
              SyntheticEmbeddings.labels.length.toLong).toInt
            UTF8String.fromString(SyntheticEmbeddings.labels(ix))
          case "embedding" =>
            ArrayData.toArrayData(Array.tabulate(dim)(pos =>
              SyntheticEmbeddings.element(seed, id, pos)))
          case other => sys.error(s"unknown column $other")
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
