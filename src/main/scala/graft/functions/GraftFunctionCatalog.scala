package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 FUNCTION CATALOG — the extension surface beside the
  * TableProvider: functions resolved through a catalog plugin
  * (`spark.sql.catalog.graftfns=graft.functions.GraftFunctionCatalog`,
  * then `SELECT graftfns.fns.bits_jaccard(a, b)`), not through
  * session-extension registration (GraftExtensions covers that path).
  * The two differ operationally at scale: catalog functions are
  * namespaced, discoverable (`SHOW FUNCTIONS IN graftfns.fns`), and — the
  * performance contract — a `ScalarFunction` exposing the MAGIC `invoke`
  * method with exact argument types is compiled as a direct method call
  * (Invoke) inside whole-stage codegen, no InternalRow boxing per row.
  * `produceResult` stays as the specified interpreted fallback.
  *
  * One function ships: `bits_jaccard(a BIGINT, b BIGINT) → DOUBLE` =
  * popcount(a & b) / popcount(a | b) — the SimHash-bit similarity
  * (q135/q168 family) as a reusable catalog citizen. The DuckDB oracle
  * replays it as bit_count arithmetic (q459).
  */
class GraftFunctionCatalog extends CatalogPlugin
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catalogName: String = "graftfns"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  private val Ns = Array("fns")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Ns))
      Array(Identifier.of(Ns, "bits_jaccard"),
        Identifier.of(Ns, "sumsq_cents"))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(Ns) && ident.name == "bits_jaccard")
      BitsJaccardUnbound
    else if (ident.namespace.sameElements(Ns) && ident.name == "sumsq_cents")
      SumSqCentsUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident.asInstanceOf[Identifier])
}

private[functions] object BitsJaccardUnbound extends UnboundFunction {
  override def name(): String = "bits_jaccard"
  override def description(): String =
    "bits_jaccard(a BIGINT, b BIGINT) -> DOUBLE: popcount(a&b)/popcount(a|b)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.forall(_.dataType == LongType),
      s"bits_jaccard takes (BIGINT, BIGINT), got $inputType")
    new BitsJaccard
  }
}

/** Bound scalar with the MAGIC invoke(long, long): codegen plans a direct
  * Invoke call; produceResult is the interpreted fallback the interface
  * requires. Deterministic, null-intolerant (inputs declared non-null
  * long primitives — Spark null-guards the call site). */
private[functions] class BitsJaccard extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = DoubleType
  override def name(): String = "bits_jaccard"
  override def canonicalName(): String = "graft.fns.bits_jaccard"
  override def isDeterministic: Boolean = true

  def invoke(a: Long, b: Long): Double = {
    val u = java.lang.Long.bitCount(a | b)
    if (u == 0) 0.0 else java.lang.Long.bitCount(a & b).toDouble / u
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    invoke(input.getLong(0), input.getLong(1))
}

private[functions] object SumSqCentsUnbound extends UnboundFunction {
  override def name(): String = "sumsq_cents"
  override def description(): String =
    "sumsq_cents(v DOUBLE) -> BIGINT: exact sum of squared integer cents"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == org.apache.spark.sql.types.DoubleType,
      s"sumsq_cents takes (DOUBLE), got $inputType")
    new SumSqCents
  }
}

/** V2 AGGREGATE function (AggregateFunction — the FunctionCatalog's
  * other half beside ScalarFunction): the exact second-moment
  * accumulator behind the q436 variance-merge law, as a catalog
  * citizen. Spark plans it as a real distributed aggregate —
  * `update` runs map-side per partition, `merge` folds the partial
  * states at the exchange — so the contract this entry proves is the
  * PARTIAL-AGGREGATION path of a user-supplied function, not just its
  * scalar math. State is one Long (squared integer cents summed
  * exactly), so any partial-order arrangement produces the identical
  * bits and the DuckDB oracle replays it as plain integer arithmetic. */
private[functions] class SumSqCents
    extends org.apache.spark.sql.connector.catalog.functions
      .AggregateFunction[java.lang.Long, java.lang.Long] {
  override def inputTypes(): Array[DataType] =
    Array(org.apache.spark.sql.types.DoubleType)
  override def resultType(): DataType = LongType
  override def name(): String = "sumsq_cents"
  override def canonicalName(): String = "graft.fns.sumsq_cents"
  override def isDeterministic: Boolean = true

  override def newAggregationState(): java.lang.Long = 0L
  override def update(state: java.lang.Long,
      input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state
    else {
      val cents = math.round(input.getDouble(0) * 100.0)
      state + cents * cents
    }
  override def merge(s1: java.lang.Long, s2: java.lang.Long): java.lang.Long =
    s1 + s2
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
