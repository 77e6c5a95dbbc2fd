package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard for the driver-generated testdata (TESTDATA.md).
  *
  * The round-6 regression — `events.ts` silently changing from
  * `timestamp[ns]` (LongType under nanosAsLong) to `timestamp[us]`
  * (TIMESTAMP_NTZ) — broke 37 catalog entries at once with no single
  * test naming the cause. This spec pins the POST-`Tables` normalized
  * schema of all 10 tables: the contract the query surface is written
  * against. If the driver regenerates testdata with different physical
  * types, this fails with the table and column named, instead of 37
  * downstream analysis errors.
  *
  * Types asserted are the normalized view (`Tables.apply`), not raw
  * parquet — the loader is allowed to absorb physical-type drift (that
  * is its job); what must stay fixed is what queries see.
  */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // ts: epoch-NANOS BIGINT — the loader-normalized view every
    // event-time query divides by 1000/1e9. See Tables.normalizeEventTs.
    "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table: normalized schema matches the TESTDATA contract") {
      val actual = Tables(spark, sfDir, table).schema
        .map(f => f.name -> f.dataType)
      assert(actual == cols,
        s"\nSchema drift in '$table'.\n  expected: $cols\n  actual:   $actual\n" +
          "If the driver regenerated testdata with new physical types, " +
          "absorb the drift in Tables (loader normalization), not in the " +
          "94 query call sites.")
    }
  }

  test("events.ts normalized values are epoch-nanos (micro-precision)") {
    val row = Tables.events(spark, sfDir)
      .selectExpr("min(ts) AS lo", "max(ts) AS hi").head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    // 2000-01-01 .. 2100-01-01 in nanos: drift to micros/millis would
    // land 3-6 orders of magnitude below this window.
    val y2000 = 946684800L * 1000000000L
    val y2100 = 4102444800L * 1000000000L
    assert(lo >= y2000 && hi < y2100,
      s"ts range [$lo, $hi] is not epoch-nanos")
    assert(lo % 1000 == 0, "ts should be whole microseconds in nanos view")
  }
}
