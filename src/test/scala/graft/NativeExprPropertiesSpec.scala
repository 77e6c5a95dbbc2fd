package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.operators.AsOfJoin

/** Property-based invariants for the native expressions and the custom
  * as-of operator, on ScalaCheck-generated data (adversarial shapes the
  * fixed test tables can't produce: duplicate timestamps, singleton and
  * empty groups, repeated tokens). */
class NativeExprPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("md5_shingles: |shingles| = max(0, tokens - n + 1) before dedup; dedup only shrinks") {
    import spark.implicits._
    val docs = Gen.listOfN(120,
      Gen.listOf(Gen.oneOf("a", "b", "c", "dd")).map(_.mkString(" ")))
      .sample.get
    val out = docs.toDF("text")
      .select(length(col("text")).as("len"),
        size(split(col("text"), " ")).as("m"),
        size(md5Shingles(tokens(col("text")), 3)).as("k"))
      .collect()
    out.foreach { r =>
      val m = r.getInt(1)
      val k = r.getInt(2)
      assert(k <= math.max(0, m - 2), r.toString)
      assert(k >= (if (m >= 3) 1 else 0), r.toString)
    }
  }

  test("simhash_bits stays within the bit budget; identical docs collide") {
    import spark.implicits._
    val texts = Gen.listOfN(60,
      Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))).sample.get
    val df = (texts ++ texts).toDF("text") // every doc twice
      .select(col("text"), simhashOf(tokens(col("text")), 32).as("sh"))
    val rows = df.collect()
    rows.foreach(r => assert((r.getLong(1) >> 32) == 0L, r.toString))
    val collisions = df.groupBy("text").agg(countDistinct("sh").as("n"))
      .filter(col("n") =!= 1).count()
    assert(collisions == 0)
  }

  test("sorted_intersect_count: symmetric, bounded by min size, self-intersect = size") {
    import spark.implicits._
    val sets = Gen.listOfN(50,
      Gen.listOf(Gen.choose(1, 40).map(_.toString))
        .map(_.distinct.sorted)).sample.get
    val df = sets.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val a = df.select(col("i").as("ia"), col("s").as("sa"))
    val b = df.select(col("i").as("ib"), col("s").as("sb"))
    val bad = a.crossJoin(b).select(
      sortedIntersectCount(col("sa"), col("sb")).as("ab"),
      sortedIntersectCount(col("sb"), col("sa")).as("ba"),
      least(size(col("sa")), size(col("sb"))).cast("long").as("cap"),
      (col("ia") === col("ib")).as("self"),
      size(col("sa")).cast("long").as("na"))
      .filter(col("ab") =!= col("ba") || col("ab") > col("cap") ||
        (col("self") && col("ab") =!= col("na")))
      .count()
    assert(bad == 0)
  }

  test("native as-of ≡ generic operator on random data with duplicate (key, time)") {
    import spark.implicits._
    val leftRows = Gen.listOfN(300, for {
      k <- Gen.choose(0L, 8L)
      t <- Gen.choose(0L, 30L)
    } yield (k, t)).sample.get.zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val rightRows = Gen.listOfN(200, for {
      k <- Gen.choose(0L, 10L)
      t <- Gen.choose(0L, 30L)
      v <- Gen.choose(0L, 99L)
    } yield (k, t, v)).sample.get
    val l = leftRows.toDF("id", "k", "t")
    val r = rightRows.toDF("k", "t", "v")
    val native = AsOfJoin.leftAsOfNative(l, "k", "t", r, "k", "t", "v", "va")
      .select("id", "va")
    val generic = AsOfJoin.leftAsOf(l, "k", "t", r, "k", "t", col("v"), "va")
      .select("id", "va")
    assert(native.count() == leftRows.length)
    assert(native.exceptAll(generic).count() == 0)
    assert(generic.exceptAll(native).count() == 0)
  }

  test("pageRank: bit-identical ranks under different input partitioning; mass is conserved") {
    import spark.implicits._
    val edges = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(0L, 40L))).sample.get
      .toDF("src", "dst")
    val a = graft.operators.Graph.pageRank(edges.repartition(1), 3)
      .orderBy("node").collect()
    val b = graft.operators.Graph.pageRank(edges.repartition(13), 3)
      .orderBy("node").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      // the round-then-decimal-sum makes this BIT equality, not approx
      assert(x.getDouble(1) == y.getDouble(1), s"$x vs $y")
    }
    // mass sanity: total rank ≤ 1 (dangling mass is dropped by contract)
    // and ≥ the teleport floor n·(1−d)/n = 0.15
    val total = a.map(_.getDouble(1)).sum
    assert(total <= 1.0 + 1e-9 && total >= 0.15 - 1e-9, total.toString)
  }

  test("ring_owner: binary search ≡ brute-force min clockwise distance; JVM ring ≡ SQL md5 span") {
    import graft.queries.LakeOps
    // (a) the driver-side ring constants equal the SQL derivation the
    // oracle uses — md5(shard || '|' || vnode) first-13-hex-digit span —
    // evaluated through Spark's own md5/expr machinery
    val (rpos, shard) = LakeOps.ringArrays(4)
    val sqlRing = spark.range(4).selectExpr("id AS shard")
      .crossJoin(spark.range(64).selectExpr("id AS v"))
      .selectExpr(
        graft.functions.TextFunctions.hexSpanValSql(
          "md5(shard || '|' || v)", 0, 13) + " AS rpos",
        "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rpos.toSeq == sqlRing.map(_._1).toSeq)
    assert(shard.toSeq == sqlRing.map(_._2).toSeq)
    // (b) for random key positions (plus the exact ring positions and
    // their neighbours), the expression's binary search returns the
    // brute-force argmin of (rpos - k mod 2^52), which is unique because
    // positions are distinct
    val mod = 4503599627370496L
    def brute(k: Long): Long = {
      val i = rpos.indices.minBy(i => java.lang.Math.floorMod(rpos(i) - k, mod))
      shard(i)
    }
    val keys = Gen.listOfN(500, Gen.choose(0L, mod - 1)).sample.get ++
      rpos.toSeq ++ rpos.toSeq.map(_ + 1) ++ rpos.toSeq.map(_ - 1) ++
      Seq(0L, mod - 1)
    import spark.implicits._
    val br = org.apache.spark.sql.GraftBridge
    val got = keys.toDF("k")
      .select(col("k"), br.column(graft.functions.RingOwner(
        br.expression(col("k")), rpos, shard)).as("owner"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (k, o) => assert(o == brute(k), s"k=$k") }
  }

  test("winnowed_token_fingerprints: matches an independent reference; planted shared runs always intersect") {
    import spark.implicits._
    val br = org.apache.spark.sql.GraftBridge
    val (k, w) = (5, 3)
    // independent JVM reference: FNV-1a per token, rolling polynomial
    // (same published recurrence the expression documents), winnow mins,
    // first-occurrence dedup
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val M = 6364136223846793005L
    def ref(ts: Seq[String]): Seq[Long] = {
      if (ts.length < k) return Seq.empty
      val wh = ts.map(fnv).sliding(k).map(_.foldLeft(0L)(_ * M + _)).toVector
      if (wh.length < w) return Seq.empty
      wh.sliding(w).map(_.min).toVector.distinct
    }
    def run(docs: Seq[Seq[String]]): Seq[Seq[Long]] =
      docs.toDF("ts").select(br.column(graft.functions.WinnowedTokenFingerprints(
          br.expression(col("ts")), k, w)).as("f"))
        .as[Seq[Long]].collect().toSeq
    // (a) random docs (including sub-k and sub-w lengths) match the reference
    val rnd = Gen.listOfN(200,
      Gen.choose(0, 14).flatMap(n => Gen.listOfN(n,
        Gen.oneOf("a", "b", "c", "dd", "ee")))).sample.get
    run(rnd).zip(rnd.map(ref)).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got == want, s"doc $i: ${rnd(i)}")
    }
    // (b) the guarantee: two docs sharing a planted run of k+w-1 unique
    // tokens, embedded in unique surroundings, share >= 1 fingerprint
    val shared = (0 until k + w - 1).map(i => s"s$i")
    val d1 = (0 until 6).map(i => s"l$i") ++ shared ++ (0 until 6).map(i => s"r$i")
    val d2 = (0 until 9).map(i => s"x$i") ++ shared ++ (0 until 4).map(i => s"y$i")
    val Seq(f1, f2) = run(Seq(d1, d2))
    assert(f1.toSet.intersect(f2.toSet).nonEmpty, s"$f1 vs $f2")
  }

  test("jpeg_sof_dims: arbitrary bytes never throw; valid-by-construction streams always parse") {
    import spark.implicits._
    // adversarial: random bytes, random bytes behind a real SOI, lone
    // markers, length fields pointing past the payload
    val fuzz: List[Array[Byte]] =
      Gen.listOfN(200, Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray)).sample.get ++
      Gen.listOfN(100, Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(bs => Array(0xFF.toByte, 0xD8.toByte) ++ bs)).sample.get
    val fuzzed = fuzz.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(graft.operators.Multimodal.jpegDims(col("content")).as("d"))
      .collect() // must not throw
    assert(fuzzed.length == fuzz.length)
    // valid streams: SOI + k APP segments with random even payloads + SOF0
    val segGen = for {
      n <- Gen.chooseNum(0, 40)
      body <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield Array(0xFF.toByte, 0xE1.toByte,
      ((n + 2) >> 8).toByte, ((n + 2) & 0xFF).toByte) ++ body
    val validGen = for {
      segs <- Gen.listOf(segGen)
      w <- Gen.chooseNum(1, 65535)
      h <- Gen.chooseNum(1, 65535)
    } yield {
      val sof = Array(0xFF, 0xC0, 0x00, 0x09, 0x08,
        h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x01, 0x11).map(_.toByte)
      (w, h, Array(0xFF.toByte, 0xD8.toByte) ++ segs.flatten ++ sof ++
        Array(0xFF.toByte, 0xD9.toByte))
    }
    val valid = Gen.listOfN(150, validGen).sample.get
    val parsed = valid.zipWithIndex
      .map { case ((w, h, b), i) => (i.toLong, w, h, b) }
      .toDF("id", "w", "h", "content")
      .select(col("w"), col("h"),
        graft.operators.Multimodal.jpegDims(col("content")).as("d"))
      .collect()
    parsed.foreach { r =>
      assert(!r.isNullAt(2), r.toString)
      assert(r.getStruct(2).getInt(0) == r.getInt(0), r.toString)
      assert(r.getStruct(2).getInt(1) == r.getInt(1), r.toString)
    }
  }

  test("jaro_winkler: range, symmetry, identity, and arbitrary input safety") {
    import spark.implicits._
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const(' ')))
      .map(_.mkString)
    val pairs = Gen.listOfN(300, Gen.zip(strGen, strGen)).sample.get
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        jaroWinkler(col("a"), col("b")).as("ab"),
        jaroWinkler(col("b"), col("a")).as("ba"),
        jaroWinkler(col("a"), col("a")).as("aa"))
      .collect()
    out.foreach { r =>
      val (a, ab, ba, aa) = (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
      assert(ab >= 0.0 && ab <= 1.0, s"range: $r")
      assert(ab == ba, s"symmetry: $r")
      // identity is 1 for non-empty strings, 0 for the empty (oracle
      // engine semantics: ''~'' scores 0)
      assert(aa == (if (a.isEmpty) 0.0 else 1.0), s"identity: $r")
    }
  }

  test("tiff_dims: construction-inversion fuzz over random dims/endian; junk never throws") {
    import spark.implicits._
    val cases = Gen.listOfN(150, Gen.zip(
      Gen.chooseNum(1, 65535), Gen.chooseNum(1, 65535),
      Gen.oneOf(true, false))).sample.get
    def le16(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
    def be16(v: Int) = f"$v%04X"
    def hexFor(w: Int, h: Int, le: Boolean): String =
      if (le)
        "49492A00" + "08000000" + "0200" +
          "0001" + "0300" + "01000000" + le16(w) + "0000" +
          "0101" + "0300" + "01000000" + le16(h) + "0000" + "00000000"
      else
        "4D4D002A" + "00000008" + "0002" +
          "0100" + "0003" + "00000001" + be16(w) + "0000" +
          "0101" + "0003" + "00000001" + be16(h) + "0000" + "00000000"
    val rows = cases.map { case (w, h, le) => (w.toLong, h.toLong,
      if (le) 0L else 1L, hexFor(w, h, le)) }
    val out = rows.toDF("w", "h", "bigendian", "hex")
      .select(col("w"), col("h"), col("bigendian"),
        graft.operators.Multimodal.tiffDims(unhex(col("hex"))).as("t"))
      .select(col("w"), col("h"), col("bigendian"),
        col("t.width"), col("t.height"), col("t.bigendian").as("be"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(0), s"width: $r")
      assert(r.getLong(4) == r.getLong(1), s"height: $r")
      assert(r.getLong(5) == r.getLong(2), s"endian: $r")
    }
    // arbitrary junk bytes: never throw, parse to NULL or a struct
    val junk = Gen.listOfN(200, Gen.listOf(Gen.chooseNum(0, 255))).sample.get
      .map(bs => bs.map(b => f"$b%02X").mkString)
    val n = junk.toDF("hex")
      .select(graft.operators.Multimodal.tiffDims(unhex(col("hex"))).as("t"))
      .count()
    assert(n == 200L)
  }

  test("zip_info and mp3_info: arbitrary bytes never throw; null on junk, parse on valid") {
    import spark.implicits._
    val fuzz: List[Array[Byte]] =
      Gen.listOfN(200, Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray)).sample.get ++
      // adversarial: EOCD sig bytes scattered mid-buffer, truncated tails
      Gen.listOfN(100, Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(bs => Array(0x50.toByte, 0x4B.toByte, 0x05.toByte, 0x06.toByte)
          ++ bs)).sample.get ++
      // mp3: sync bytes followed by junk (reserved indices, truncation)
      Gen.listOfN(100, Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(bs => Array(0xFF.toByte, 0xFB.toByte) ++ bs)).sample.get
    val out = fuzz.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(graft.operators.Multimodal.zipInfo(col("content")).as("z"),
        graft.operators.Multimodal.mp3Info(col("content")).as("m"))
      .collect() // must not throw
    assert(out.length == fuzz.length)
    // a canonical valid zip tail and a 3-frame CBR mp3 both parse
    val cd = "504B0102" + "1400" + "1400" + "0000" + "0800" + "0000" +
      "0000" + "00000000" + "2A000000" + "2A000000" + "0200" + "0000" +
      "0000" + "0000" + "0000" + "00000000" + "00000000" + "4631"
    val eocd = "504B0506" + "0000" + "0000" + "0100" + "0100" +
      "30000000" + "00000000" + "0000"
    // 128 kbps @ 44100, no padding: frameLen = 144*128000/44100 = 417
    val frame = "FFFB" + "90" + "00" + "00" * 413
    val r = Seq((cd + eocd, frame * 3)).toDF("zh", "mh")
      .select(graft.operators.Multimodal.zipInfo(unhex(col("zh"))).as("z"),
        graft.operators.Multimodal.mp3Info(unhex(col("mh"))).as("m"))
      .selectExpr("z.n_entries", "z.comp_bytes", "m.n_frames",
        "m.bitrate_kbps", "m.sample_rate", "m.duration_ms")
      .collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 42L)
    assert(r.getLong(2) == 3L && r.getLong(3) == 128L)
    assert(r.getLong(4) == 44100L && r.getLong(5) == 3L * 1152 * 1000 / 44100)
  }

  test("webp_dims: construction-inversion fuzz over both bitstreams; junk never throws") {
    import spark.implicits._
    // adversarial: random bytes, and random bytes behind a real RIFF tag
    val byteGen = Gen.chooseNum(-128, 127).map(_.toByte)
    val fuzz: List[Array[Byte]] =
      Gen.listOfN(200, Gen.nonEmptyListOf(byteGen).map(_.toArray)).sample.get ++
      Gen.listOfN(100, Gen.nonEmptyListOf(byteGen)
        .map(bs => "RIFF".getBytes("ASCII") ++ bs)).sample.get
    val fuzzed = fuzz.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(graft.operators.Multimodal.webpDims(col("content")).as("d"))
      .collect() // must not throw
    assert(fuzzed.length == fuzz.length)
    // valid-by-construction containers: random dims, both bitstreams,
    // optional odd-payload junk chunk ahead (exercises the pad skip)
    def le32(v: Long) = Array[Byte](
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val cases = Gen.listOfN(150, Gen.zip(
      Gen.chooseNum(1, 16383), Gen.chooseNum(1, 16383),
      Gen.oneOf(true, false), Gen.oneOf(true, false))).sample.get
    val blobs = cases.map { case (w, h, lossless, withJunk) =>
      val stream =
        if (lossless) {
          val packed = (w - 1).toLong | ((h - 1).toLong << 14)
          "VP8L".getBytes("ASCII") ++ le32(5) ++
            (Array(0x2F.toByte) ++ le32(packed)) ++ Array(0x00.toByte)
        } else
          "VP8 ".getBytes("ASCII") ++ le32(10) ++
            Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A) ++ le16(w) ++ le16(h)
      val junk =
        if (withJunk)
          "EXIF".getBytes("ASCII") ++ le32(3) ++
            "AAA".getBytes("ASCII") ++ Array(0x00.toByte)
        else Array.empty[Byte]
      val inner = junk ++ stream
      (w, h, lossless,
        "RIFF".getBytes("ASCII") ++ le32(4L + inner.length) ++
          "WEBP".getBytes("ASCII") ++ inner)
    }
    val parsed = blobs.zipWithIndex
      .map { case ((w, h, ll, b), i) => (i.toLong, w, h, ll, b) }
      .toDF("id", "w", "h", "ll", "content")
      .select(col("w"), col("h"), col("ll"),
        graft.operators.Multimodal.webpDims(col("content")).as("d"))
      .collect()
    parsed.foreach { r =>
      assert(!r.isNullAt(3), r.toString)
      val d = r.getStruct(3)
      assert(d.getString(0) == (if (r.getBoolean(2)) "lossless" else "lossy"),
        r.toString)
      assert(d.getLong(1) == r.getInt(0).toLong, r.toString)
      assert(d.getLong(2) == r.getInt(1).toLong, r.toString)
    }
  }
}
