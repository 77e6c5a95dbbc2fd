package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorFunctions._

/** Retrieval QUALITY gates for the ANN family. An oracle hash-match
  * proves the algorithm runs deterministically as specified — it says
  * nothing about whether the index retrieves well (a mis-banded LSH once
  * agreed with its own oracle at 36% recall). Each approximate path is
  * measured against brute force on the sf0.001 corpus; every operator is
  * deterministic, so recall is a fixed number per corpus and the floors
  * assert it never regresses. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val K = 20

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .withColumn("e", col("embedding").cast("array<double>"))
  private def corpus = emb.filter(col("vec_id") =!= 0).select("vec_id", "label", "e")
  private def query = emb.filter(col("vec_id") === 0)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    import spark.implicits._
    df.select("vec_id").as[Long].collect().toSet
  }

  private def recallOf(approx: Set[Long], exact: Set[Long]): Double =
    approx.intersect(exact).size.toDouble / exact.size

  test("q137 dHash bands have EXACT recall at the guaranteed radius") {
    // the pigeonhole claim the oracle cannot check (it replays the same
    // bands): every pair within hamming <= DhMaxHamming = bands - 1 MUST
    // share a 16-bit band, so q137's output equals the brute-force pair
    // set at that radius — zero recall gap, not a floor
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q137_block_dhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all-pairs hamming over the same fingerprints (tiny sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hashes = graft.queries.TextOps6.dhashFingerprints(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ida, idb)).toSet
    assert(out == brute, s"band pairs $out != brute $brute")
    graft.operators.PlanCache.releaseAll()
  }

  test("sign-LSH multi-probe recall vs brute-force cosine") {
    val exact = ids(Similarity.cosineTopK(corpus, "e", query, "e", K, "vec_id"))
    val lsh = ids(Similarity.annTopK(
      corpus, "e", query, "e", hyperplanes(8), K, "vec_id"))
    val r = recallOf(lsh, exact)
    info(s"sign-LSH multi-probe recall@$K = $r (9 of 256 buckets probed)")
    assert(r >= 0.2, s"sign-LSH recall degraded to $r")
  }

  test("IVF recall vs brute-force cosine, and nProbe=all is exact") {
    val exact = ids(Similarity.cosineTopK(corpus, "e", query, "e", K, "vec_id"))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("e").as("cvec"))
    val ivf2 = ids(Similarity.ivfTopK(
      corpus, "vec_id", "e", cents, "cid", "cvec", query, "e", K, nProbe = 2))
    val r = recallOf(ivf2, exact)
    info(s"IVF nProbe=2/16 recall@$K = $r")
    assert(r >= 0.6, s"IVF nProbe=2 recall degraded to $r")
    // probing every cluster must recover brute force exactly — the
    // partition-of-the-corpus invariant of an IVF index
    val ivfAll = ids(Similarity.ivfTopK(
      corpus, "vec_id", "e", cents, "cid", "cvec", query, "e", K, nProbe = 16))
    assert(ivfAll == exact, "IVF with all probes must equal brute force")
  }

  test("joint PQ training (one pass, all subspaces) equals per-subspace training") {
    import spark.implicits._
    val joint = Similarity.trainPqCodebooksL2(
      emb.select(col("vec_id"), col("e")), "vec_id", "e",
      m = 4, k = 8, iters = 2, dim = 64)
    for (s <- 0 until 4) {
      val solo = Similarity.trainCentroidsL2(
        emb.select(col("vec_id"), slice(col("e"), s * 16 + 1, 16).as("sv")),
        "vec_id", "sv", k = 8, iters = 2)
      val a = joint(s).as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
      val b = solo.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
      assert(a == b, s"subspace $s diverged")
    }
  }

  test("PQ/ADC recall vs brute-force inner product") {
    import spark.implicits._
    val exactDot = query.select(col("e").as("qe")).crossJoin(corpus)
      .select(col("vec_id"), dot(col("e"), col("qe")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(K)
    val cb = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code"), col("e").as("cvec"))
    val pq = ids(Similarity.pqTopK(
      corpus, "vec_id", "e", cb, "code", "cvec", query, "e", K, m = 4, dim = 64))
    val r = recallOf(pq, ids(exactDot))
    info(s"PQ/ADC (m=4, 16 codes) recall@$K = $r")
    assert(r >= 0.25, s"PQ/ADC recall degraded to $r")
  }
}
