package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Dedup}

import java.sql.Timestamp

/** The reusable operator API (as-of join, dedup) on hand-built frames with
  * known answers. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)

  test("leftAsOf attaches the most recent right value at-or-before each left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 10:02:00")),
      (4L, "A", ts("2024-01-01 09:00:00"))   // before any quote
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:30:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 105.0), // exactly simultaneous w/ trade 2
      ("B", ts("2024-01-01 10:01:00"), 50.0)
    ).toDF("sym", "qt", "px")
    val got = AsOfJoin.leftAsOf(trades, "sym", "t", quotes, "sym", "qt",
        col("px"), "last_px")
      .orderBy("trade_id")
      .select("trade_id", "last_px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq == Seq(
      1L -> Some(100.0),   // 09:30 quote
      2L -> Some(105.0),   // simultaneous quote visible (≤ semantics)
      3L -> Some(50.0),
      4L -> None))         // no quote yet
  }

  test("Dedup.exact keeps the minimum id per content and counts copies") {
    val docs = Seq((10L, "x"), (3L, "x"), (7L, "y")).toDF("id", "body")
    val got = Dedup.exact(docs, "id", "body")
      .orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((3L, 2L), (7L, 1L)))
  }

  test("minhashNearDupPairs finds an exact near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"),                       // near-dup of 1
      (3L, "completely different words entirely here with nothing shared at all ok")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("connectedComponents labels chains, separate components, and stars by min id") {
    // chain 1-2-3-4-5 (diameter stresses the pointer jumping), star around
    // 10, and an isolated edge 20-21; edge direction must not matter
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), // chain, mixed directions
      (10L, 11L), (10L, 12L), (13L, 10L),     // star
      (21L, 20L)
    ).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents (distributed path) converges on a long chain within the round budget") {
    // a 33-node path: min-label alone needs 32 rounds; with pointer
    // jumping the fixpoint must land well inside maxIters = 10.
    // localEdgeThreshold = 0 forces the distributed fixpoint.
    val edges = (0L until 32L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b", maxIters = 10,
        localEdgeThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == 33)
    assert(got.forall(_._2 == 0L))
  }

  test("packSequences conserves tokens and assigns chunks by start offset") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 90L), ("a", 3L, 60L), ("a", 4L, 250L),
      ("b", 1L, 10L), ("b", 2L, 10L))
      .toDF("grp", "id", "tok")
    val out = graft.operators.Packing
      .packSequences(docs, "grp", "id", col("tok"), 128)
      .select("grp", "id", "start_offset", "chunk_id")
      .as[(String, Long, Long, Long)].collect().sortBy(x => (x._1, x._2)).toSeq
    // start offsets are the exclusive running sum within the group
    assert(out.filter(_._1 == "a").map(_._3) == Seq(0L, 100L, 190L, 250L))
    // chunk = start div window: doc 2 starts at 100 (chunk 0), doc 3 at
    // 190 (chunk 1), doc 4 at 250 (chunk 1 — windows hold STARTS; long
    // docs spill forward by design)
    assert(out.filter(_._1 == "a").map(_._4) == Seq(0L, 0L, 1L, 1L))
    assert(out.filter(_._1 == "b").map(_._4) == Seq(0L, 0L))
  }

  test("q242 winnowing guarantee: a planted 57-token run is found, a 50-token run is filtered") {
    // Independent of the driver corpus: plant (a) a shared run of
    // exactly SubMinRun = 57 tokens (must be reported with max_run 57
    // and 8 shared windows) and (b) a shared run of exactly 50 tokens —
    // one matching window, but below the K+W-1 guarantee, so the filter
    // must drop it on BOTH the winnowed path and the brute-force oracle.
    import spark.implicits._
    val s57 = (0 until 57).map(i => s"s$i")
    val t50 = (0 until 50).map(i => s"t$i")
    def toks(p: String, n: Int) = (0 until n).map(i => s"$p$i")
    val doc1 = (toks("u", 10) ++ s57 ++ toks("v", 10) ++ t50 ++ toks("w", 10))
      .mkString(" ")
    val doc2 = (toks("x", 20) ++ s57 ++ toks("y", 20)).mkString(" ")
    val doc3 = (toks("p", 20) ++ t50 ++ toks("q", 20)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("q242fix").toString
    Seq((1L, doc1, "en", "synth", doc1.length.toLong),
        (2L, doc2, "en", "synth", doc2.length.toLong),
        (3L, doc3, "en", "synth", doc3.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q242_exact_substring_dedup")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 8L, 57L)), s"got $out")
  }

  test("assignCells: cosine ties go to the lowest cid; empty corpus assigns nothing") {
    import spark.implicits._
    import graft.operators.Similarity
    // two identical centroids → every assignment ties → cid 0 must win
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0))).toDF("cid", "cvec")
    val got = Similarity.assignCells(
        Seq((7L, Seq(0.6, 0.8)), (8L, Seq(1.0, 0.0))).toDF("vec_id", "e"),
        "e", cents, "cid", "cvec")
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 0L, 8L -> 0L), got.toString)
    val empty = Similarity.assignCells(
      Seq.empty[(Long, Seq[Double])].toDF("vec_id", "e"),
      "e", cents, "cid", "cvec")
    assert(empty.count() == 0)
    // an UNTRAINED index must fail loudly, not silently assign every row
    // to the argmax fold's sentinel seed (cid 0, csim −2.0). The guard is
    // a raise_error INSIDE the packed broadcast row (ADVICE r8: no eager
    // emptiness job), so it fires at execution time of the consuming
    // query — walk the cause chain for the message.
    val ex = intercept[Throwable] {
      Similarity.assignCells(
        Seq((7L, Seq(0.6, 0.8))).toDF("vec_id", "e"),
        "e", Seq.empty[(Long, Seq[Double])].toDF("cid", "cvec"),
        "cid", "cvec").collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("centroid frame is empty"), msgs)
  }

  test("IncrementalAgg: any split of the input merges to the whole-input summary") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(4).toString, rnd.nextInt(10000) / 100.0))
      .toDF("k", "v")
    val whole = graft.operators.IncrementalAgg.summarize(rows, Seq("k"), "v")
      .select(col("k"), col("n"), col("sum_v").cast("decimal(38,2)"),
        col("min_v"), col("max_v"))
    for (mod <- Seq(2, 5)) {
      val parts = (0 until mod).map(i =>
        graft.operators.IncrementalAgg.summarize(
          rows.filter(crc32(concat(col("k"), col("v"))) % mod === i), Seq("k"), "v"))
      val merged = graft.operators.IncrementalAgg.merge(Seq("k"), parts: _*)
        .select(col("k"), col("n").cast("long").as("n"),
          col("sum_v").cast("decimal(38,2)"), col("min_v"), col("max_v"))
      assert(merged.exceptAll(whole).count() == 0, s"mod=$mod")
      assert(whole.exceptAll(merged).count() == 0, s"mod=$mod")
    }
  }

  test("connectedComponents: driver union-find and distributed fixpoint agree on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("a", "b")
    val local = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val dist = Dedup.connectedComponents(edges, "a", "b",
        localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(local == dist)
    assert(local.nonEmpty)
  }

  test("incrementalNearDupStep: random corpus, random batching ≡ the batch run") {
    // the replay-equivalence property behind q170/q177, randomized: any
    // partition of the corpus into ordered arrival batches must yield
    // exactly the batch pair set (and the same clusters via
    // contract-run-compose); a fixed 3-way split can hide an ordering
    // bug, a random one cannot
    val rnd = new scala.util.Random(23)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    // near-dup structure: base sentences mutated in one position
    val docs = (0L until 40L).map { i =>
      val base = Array.tabulate(8)(j => words((i.toInt / 4 + j) % words.length))
      if (i % 4 != 0) base(rnd.nextInt(8)) = words(rnd.nextInt(words.length))
      (i, base.mkString(" "))
    }.toDF("doc_id", "text")
    val batchOf = (0L until 40L).map(i => i -> rnd.nextInt(4)).toMap
    val batchCol = udf((id: Long) => batchOf(id))
    val expected = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    var index = Dedup.minhashSignatures(docs.limit(0), "doc_id", "text")
    var found = Set.empty[(Long, Long)]
    (0 until 4).foreach { b =>
      val batch = docs.filter(batchCol(col("doc_id")) === b)
      val (pairs, updated) = Dedup.incrementalNearDupStep(
        index, batch, "doc_id", "text")
      found ++= pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
      index = updated.localCheckpoint(true)
    }
    assert(found == expected && expected.nonEmpty,
      s"incremental=$found batch=$expected")
    graft.operators.PlanCache.releaseAll()
  }

  test("minhashNearDupPairs: a super-gate candidate set completes on the shuffle path with identical pairs") {
    // VERDICT r16 #1: the bare-pair-list broadcast hint must be GATED so
    // a banding collision storm degrades to a shuffle join instead of
    // OOMing the driver. Force the gate shut (limit 0) and prove the
    // shuffle path computes the same verified pairs as the broadcast
    // path on a duplicate-heavy corpus (every doc a near-dup of its
    // group ⇒ many band-bucket candidates).
    val words = Array("red", "blue", "green", "gold", "gray", "teal")
    val docs = (0L until 36L).map { i =>
      val base = Array.tabulate(9)(j => words((i.toInt / 12 + j) % words.length))
      base(i.toInt % 9) = words((i.toInt + 1) % words.length)
      (i, base.mkString(" "))
    }.toDF("doc_id", "text")
    val key = "spark.graft.dedup.broadcastPairLimit"
    val expected = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    spark.conf.set(key, "0")
    try {
      val viaShuffle = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(viaShuffle == expected && expected.nonEmpty)
    } finally {
      spark.conf.unset(key)
      spark.catalog.clearCache()
    }
  }

  test("Spread gate: byte-aware, partition-aware, and unit-decidable") {
    import graft.operators.Spread
    // pure decision: a single tiny file cannot parallelize — spread
    assert(Spread.shouldSpread(1L, 4 << 20, 128L << 20, 32))
    // few files but HUGE bytes (the 900 × 100 GB case, VERDICT r16 #4):
    // the scan itself splits into ~750k row-group tasks — never spread
    assert(!Spread.shouldSpread(900L, 90L * (1L << 40), 128L << 20, 2000))
    // many small files: file count alone provides the parallelism
    assert(!Spread.shouldSpread(64L, 64L * (4 << 20), 128L << 20, 32))
    // operator gate on non-file frames (ADVICE r16): an in-memory frame
    // already at >= par/2 partitions must be left alone...
    val par = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000).toDF("doc_id").repartition(par)
    assert(Spread.byKey(wide, "doc_id").rdd.getNumPartitions == par
      && (Spread.byKey(wide, "doc_id") eq wide))
    // ...while a serial one-partition in-memory frame still spreads
    val narrow = spark.range(0, 1000).toDF("doc_id").coalesce(1)
    assert(Spread.byKey(narrow, "doc_id").rdd.getNumPartitions == par)
  }

  test("semanticDedup keeps the farthest-from-centroid member of each in-cluster dup group") {
    import graft.operators.Similarity
    // two well-separated clusters; each holds a near-dup pair plus (in
    // cluster 0) one distinct member. The paper's rule keeps the LOWER
    // centroid-cosine member of a dup pair.
    val corpus = Seq(
      (10L, Seq(1.0, 0.05)),  // cluster 0, csim highest → dropped
      (11L, Seq(1.0, 0.10)),  // cluster 0, near-dup of 10, farther → kept
      (12L, Seq(0.3, -1.0)),  // cluster 0, not a near-dup of anything → kept
      (20L, Seq(0.05, 1.0)),  // cluster 1, csim highest → dropped
      (21L, Seq(0.10, 1.0))   // cluster 1, near-dup of 20, farther → kept
    ).toDF("id", "v")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cid", "cvec")
    val got = Similarity.semanticDedup(corpus, "id", "v", cents, "cid", "cvec",
        threshold = 0.9)
      .select("id", "cid", "kept").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    spark.catalog.clearCache()
    assert(got == Seq((10L, 0L, 0L), (11L, 0L, 1L), (12L, 0L, 1L),
      (20L, 1L, 0L), (21L, 1L, 1L)))
  }

  test("bfsHops: exact hop distances on a known graph, frontier never revisits") {
    // path 1-2-3-4-5 plus a shortcut 1-4: dist(1→4) must be 1 (shortcut
    // wins over the 3-hop path), dist(1→5)=2, and nodes beyond maxHops
    // are absent
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val edges = base.union(base.select($"dst".as("src"), $"src".as("dst")))
    val probes = Seq(1L).toDF("probe")
    val got = graft.operators.Graph.bfsHops(edges, probes, maxHops = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L),
      (1L, 4L, 1L), (1L, 5L, 2L)))
  }

  test("bfsHops: maxHops bounds the result; unreachable components never appear") {
    val base = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val edges = base.union(base.select($"dst".as("src"), $"src".as("dst")))
    val got = graft.operators.Graph.bfsHops(
        edges, Seq(1L).toDF("probe"), maxHops = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (1L, 2L, 1L))) // 3 is 2 hops, 8/9 disconnected
  }

  test("hits: star graph concentrates authority on the hub's target") {
    // hubs 1,2,3 all point at authority 100; 1 also points at 101.
    // After max-normalization: auth(100)=1 (three in-links), hub scores
    // max-normalized with node 1 (two out-links) at 1.0
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 100L), (1L, 101L))
      .toDF("src", "dst")
    val got = graft.operators.Graph.hits(edges, iters = 2)
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("auth", 100L)) == 1.0)
    assert(got(("auth", 101L)) < 1.0 && got(("auth", 101L)) > 0.0)
    assert(got(("hub", 1L)) == 1.0)
    assert(got(("hub", 2L)) == got(("hub", 3L)))
    assert(got(("hub", 2L)) < 1.0)
  }
}
