package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when a hot
  * key concentrates one reducer and AQE's runtime skew splitting can't
  * apply (e.g. the skewed side feeds a co-grouped downstream op, or the
  * planner's stats miss the skew).
  *
  * Left rows scatter across S salt buckets DETERMINISTICALLY (salt =
  * xxhash of a caller-chosen discriminator column mod S — never rand():
  * retries and speculative tasks must re-derive the same salt or the
  * join duplicates/drops rows); the right side replicates ×S via a
  * broadcast-friendly explode. Result ≡ the plain equi-join, row for
  * row — asserted by the catalog oracle, which IS the plain join.
  *
  * Cost model: right side pays ×S replication through the shuffle, the
  * hot left key spreads over S reducers. Use when max-key share ≫ 1/S;
  * for uniform keys it is pure overhead (that trade is the caller's).
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
