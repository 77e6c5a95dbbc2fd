package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Decoders
import graft.functions.TextFunctions._

/** Property-based invariants (SURVEY.md §5.2): decode totality, pivot
  * conservation, dedup bounds, Jaccard metric laws, MinHash min-merge.
  * Inputs are ScalaCheck-generated, evaluated in batches through Spark. */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("decodeKey is total: any byte sequence decodes to a non-null string") {
    import spark.implicits._
    val keys = Gen.listOfN(200,
      Gen.nonEmptyListOf(Arbitrary.arbitrary[Byte]).map(_.toArray))
      .sample.get
    val out = keys.toDF("key")
      .select(Decoders.decodeKey($"key").as("k"))
      .as[String].collect()
    assert(out.length == 200 && out.forall(_ != null))
  }

  test("pivot conserves the grouped total (row count and quantity mass)") {
    import spark.implicits._
    val rows = Gen.listOfN(300, for {
      g <- Gen.oneOf("A", "N", "R")
      s <- Gen.oneOf("O", "F")
      q <- Gen.choose(0, 10000).map(_ / 100.0)   // 2-decimal quantities
    } yield (g, s, q)).sample.get
    val df = rows.toDF("flag", "status", "qty")
    val totalMass = df.agg(sum($"qty".cast("decimal(18,2)"))).head.getDecimal(0)
    val pivotMass = df.groupBy("status").pivot("flag", Seq("A", "N", "R"))
      .agg(sum($"qty".cast("decimal(18,2)")))
      .select((coalesce($"A", lit(0)) + coalesce($"N", lit(0)) +
        coalesce($"R", lit(0))).as("row_mass"))
      .agg(sum($"row_mass")).head.getDecimal(0)
    assert(totalMass.compareTo(pivotMass) == 0)
  }

  test("exact dedup: distinct count ≤ total, and keeper ids are distinct members") {
    import spark.implicits._
    val texts = Gen.listOfN(150, Gen.oneOf(
      "a b c", "a b c", "x y", "q w e r", "a b d")).sample.get
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dedup = df.groupBy("text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n"))
    val total = df.count()
    val kept = dedup.count()
    assert(kept <= total)
    assert(dedup.agg(sum($"n")).head.getLong(0) == total)
    val keepers = dedup.select("keep_id").as[Long].collect().toSet
    assert(keepers.size == kept)
  }

  test("Jaccard over shingle sets: range [0,1], symmetry, identity") {
    import spark.implicits._
    val docs = Gen.listOfN(40, Gen.chooseNum(3, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
        .map(_.mkString(" ")))).sample.get
    val sh = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select($"doc_id", array_distinct(shingles(tokens($"text"))).as("s"))
    val a = sh.select($"doc_id".as("ia"), $"s".as("sa"))
    val b = sh.select($"doc_id".as("ib"), $"s".as("sb"))
    val inter = size(array_intersect($"sa", $"sb"))
    val uni = size($"sa") + size($"sb") - inter
    val pairs = a.join(b, lit(true))
      .filter(size($"sa") > 0 && size($"sb") > 0)
      .select($"ia", $"ib", (inter.cast("double") / uni).as("j"))
      .collect()
    assert(pairs.forall(r => { val j = r.getDouble(2); j >= 0.0 && j <= 1.0 }))
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m.forall { case ((x, y), j) => m((y, x)) == j })   // symmetry
    assert(m.forall { case ((x, y), j) => x != y || j == 1.0 }) // identity
  }

  test("MinHash min-merge: minhash(A ++ B) == min(minhash(A), minhash(B))") {
    import spark.implicits._
    val gen = Gen.listOfN(60, for {
      na <- Gen.chooseNum(1, 20)
      nb <- Gen.chooseNum(1, 20)
      a <- Gen.listOfN(na, Gen.identifier.map(_.take(8)))
      b <- Gen.listOfN(nb, Gen.identifier.map(_.take(8)))
    } yield (a, b)).sample.get
    val df = gen.toDF("a", "b")
    val bad = df.select(
      minhash($"a", 3).as("ha"), minhash($"b", 3).as("hb"),
      minhash(concat($"a", $"b"), 3).as("hab"))
      .filter($"hab" =!= least($"ha", $"hb"))
      .count()
    assert(bad == 0)
  }

  test("TopKAggregator: any reduce/merge split equals global sort-take-k") {
    // the map-side-combine law the aggregator's scale claim rests on:
    // split the input anywhere, reduce each side, merge — same top-k as
    // sorting the whole input (score desc, id asc tiebreak)
    val agg = new graft.functions.TopKAggregator(4)
    val pairs = Gen.listOfN(80, for {
      s <- Gen.chooseNum(0, 9).map(_.toDouble) // coarse scores force ties
      id <- Gen.chooseNum(0L, 1000L)
    } yield (s, id)).sample.get.distinct
    val expected = pairs.sortBy { case (s, id) => (-s, id) }.take(4).map(_._2)
    for (cut <- Seq(0, 1, pairs.length / 2, pairs.length)) {
      val (l, r) = pairs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"cut=$cut")
      // commutativity
      val swapped = agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(swapped) == expected, s"cut=$cut swapped")
    }
  }

  test("semanticDedup: one keeper survives per cluster, and the result is partitioning-independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // random unit-ish 4-d vectors with planted duplicates to make the
    // threshold fire
    val base = Seq.tabulate(60)(i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble() - 0.5)))
    val dups = base.take(15).map { case (id, v) =>
      (id + 1000L, v.map(_ * 1.02 + 0.001)) }
    val corpus = (base ++ dups).toDF("id", "v")
    val cents = base.take(4).map { case (id, v) => (id, v) }.toDF("cid", "cvec")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val out = graft.operators.Similarity
        .semanticDedup(df, "id", "v", cents, "cid", "cvec", threshold = 0.95)
        .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
      spark.catalog.clearCache()
      out
    }
    val got = run(corpus)
    // every non-empty cluster keeps at least one member (the cluster's
    // minimum-(csim,id) member has no dominator by construction)
    val byCluster = got.groupBy(_._2)
    assert(byCluster.values.forall(_.exists(_._4 == 1L)))
    assert(got.exists(_._4 == 0L), "planted duplicates should drop members")
    // deterministic under any partitioning (retry/speculation safety)
    assert(run(corpus.repartition(7)) == got)
  }

  test("bmpDims/gifDims round-trip arbitrary constructed headers exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def le(v: Long, n: Int) =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte)
    // 60 random (width, height, topdown) triples, incl. i32 sign edges
    val cases = Seq.tabulate(60) { i =>
      val w = rnd.nextInt(1 << 16).toLong + 1
      val h = rnd.nextInt(1 << 16).toLong + 1
      val topdown = i % 3 == 0
      (i.toLong, w, h, topdown)
    } :+ (1000L, 2147483647L, 2147483647L, false) :+
      (1001L, 1L, 2147483647L, true)
    val bmps = cases.map { case (id, w, h, td) =>
      val hRaw = if (td) (-h) & 0xFFFFFFFFL else h
      val bytes = (Seq(0x42, 0x4D).map(_.toByte) ++ le(0, 4) ++ le(0, 4) ++
        le(54, 4) ++ le(40, 4) ++ le(w, 4) ++ le(hRaw, 4) ++
        le(1, 2) ++ le(24, 2)).toArray
      (id, w, h, if (td) 1L else 0L, bytes)
    }
    val back = bmps.toDF("id", "w", "h", "td", "content")
      .select(col("id"), col("w"), col("h"), col("td"),
        graft.operators.Multimodal.bmpDims(col("content")).as("p"))
      .select(col("id"), col("w"), col("h"), col("td"),
        col("p.width"), col("p.height"), col("p.topdown"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    back.foreach { case (id, w, h, td, pw, ph, ptd) =>
      assert(pw == w && ph == h && ptd == td, s"bmp case $id")
    }
    val gifs = cases.filter(_._2 < 65536).filter(_._3 < 65536)
      .map { case (id, w, h, _) =>
        val bytes = ("GIF87a".getBytes("US-ASCII") ++
          le(w, 2) ++ le(h, 2) ++ Seq(0xF7, 0, 0).map(_.toByte)).toArray
        (id, w, h, bytes)
      }
    val gback = gifs.toDF("id", "w", "h", "content")
      .select(col("id"), col("w"), col("h"),
        graft.operators.Multimodal.gifDims(col("content")).as("p"))
      .select(col("id"), col("w"), col("h"), col("p.width"), col("p.height"))
      .as[(Long, Long, Long, Long, Long)].collect()
    gback.foreach { case (id, w, h, pw, ph) =>
      assert(pw == w && ph == h, s"gif case $id")
    }
  }
}
