package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink format breadth: the engine round-trips ORC, CSV, and JSON
  * alongside parquet (the reference's only format), preserving values. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("orc, csv, and json round-trip the supplier table losslessly") {
    val supplier = Tables.supplier(spark, sfDir)
      .orderBy("s_suppkey")
    val expected = supplier.collect().toSeq
    val base = Files.createTempDirectory("graft_formats").toString

    supplier.write.orc(s"$base/orc")
    val orc = spark.read.orc(s"$base/orc").orderBy("s_suppkey").collect().toSeq
    assert(orc == expected)

    supplier.write.option("header", true).csv(s"$base/csv")
    val csv = spark.read.option("header", true)
      .schema(supplier.schema).csv(s"$base/csv")
      .orderBy("s_suppkey").collect().toSeq
    assert(csv == expected)

    supplier.write.json(s"$base/json")
    val json = spark.read.schema(supplier.schema).json(s"$base/json")
      .orderBy("s_suppkey").collect().toSeq
    assert(json == expected)
  }
}
