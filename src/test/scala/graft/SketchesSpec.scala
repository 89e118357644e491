package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DedupSketches => DS, Multimodal, TextAnalysis => TA, VectorSim => VS}

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: n-grams count = tokens - n + 1 (distinct), short docs drop out") {
    val d = docs((1L, "a b c d e"), (2L, "x y"), (3L, "p p p p"))
    val sh = DS.shingles(d, 3).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sh.count(_._1 == 1L) == 3) // a b c / b c d / c d e
    assert(!sh.exists(_._1 == 2L)) // too short
    assert(sh.count(_._1 == 3L) == 1) // "p p p" twice → distinct
  }

  test("minhash: identical docs get identical signatures; disjoint docs differ") {
    val d = docs((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
    val sig = DS.minhashSignature(DS.shingles(d, 3)).collect()
      .map(r => r.getLong(0) -> (1 to DS.NumHashes).map(i => r.getLong(i)))
      .toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("LSH: identical docs are candidate pairs") {
    val d = docs((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
    val cand = DS.candidatePairs(DS.lshBands(DS.minhashSignature(DS.shingles(d, 3))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSeq == Seq((1L, 2L)))
  }

  test("verified jaccard: identical = 1.0, disjoint candidates = 0") {
    val d = docs((1L, "a b c d e f"), (2L, "a b c d e f"))
    val sh = DS.shingles(d, 3)
    import spark.implicits._
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val j = DS.verifiedJaccard(cand, sh).collect()(0).getAs[Double]("jaccard")
    assert(j == 1.0)
  }

  test("simhash: 64-bit BIGINT pins the md5 bit convention, equal docs equal") {
    val d = docs((1L, "a b c a b"), (2L, "a b c a b"), (3L, "z z z z z"))
    val out = DS.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    // a doc with ONE distinct token has every per-bit sum sign equal to the
    // corresponding md5(token) bit, so its simhash IS the first 8 bytes of
    // md5("z") — pins bit j ↦ BIGINT position 63-j exactly
    val md5z = java.security.MessageDigest.getInstance("MD5")
      .digest("z".getBytes("UTF-8")).take(8)
      .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    assert(out(3L) == md5z)
  }

  test("cosine machinery: dot/norm on a known vector") {
    import spark.implicits._
    val v = Array.fill(VS.Dim)(1.0f)
    val df = Seq((1L, v)).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    val n = df.select(VS.norm2("v").as("n")).collect()(0).getDouble(0)
    assert(n == VS.Dim.toDouble)
  }

  test("LCG hyperplane coefficients are in [-0.5, 0.5) and deterministic") {
    val cs = for (p <- 0 until VS.NumPlanes; i <- 0 until VS.Dim) yield VS.coef(p, i)
    assert(cs.forall(c => c >= -0.5 && c < 0.5))
    assert(VS.coef(3, 17) == VS.coef(3, 17))
    assert(cs.distinct.size > 400) // not degenerate
  }

  test("text analysis: stopword hits + fingerprint normalization") {
    import org.apache.spark.sql.functions._
    val d = docs((1L, "the cat and the dog"), (2L, "THE  cat and the dog"))
    val hits = d.select(TA.hitCount(TA.tokens(col("text")), Seq("the", "and")).as("h"))
      .orderBy().collect().map(_.getLong(0))
    assert(hits.contains(3L))
    val fps = d.select(TA.fingerprint(col("text")).as("fp")).collect().map(_.getString(0))
    assert(fps(0) == fps(1)) // case + whitespace normalized
  }

  test("connected components: chains collapse to min label, singleton pairs separate") {
    import org.apache.spark.sql.functions._
    import graft.functions.{DedupSketches => DS}
    val spark0 = spark
    import spark0.implicits._
    // chain 1-2-3-4-5 (diameter 4, exercises pointer doubling), pair 10-11,
    // pair 20-21 — three components
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val got = DS.connectedComponents(pairs)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("incremental dedup cost follows |delta|, not corpus size") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    // 1000 docs in 100 clusters of 10 identical members. Every token
    // carries the cluster id, so every shingle is cluster-distinct:
    // clustermates share all band buckets, different clusters share none
    // (minhash is a min over the shingle set — a shared prefix would
    // dominate the min and merge unrelated clusters into one hot bucket)
    val corpus = spark.range(0L, 1000L).select($"id".as("doc_id"),
      { val c = ($"id" / 10).cast("long").cast("string")
        concat_ws(" ", concat(lit("alpha"), c), concat(lit("beta"), c),
          concat(lit("gamma"), c), concat(lit("delta"), c),
          concat(lit("epsilon"), c), concat(lit("zeta"), c)).as("text") })
    val bands = DS.lshBands(DS.minhashSignature(DS.shingles(corpus, 3))).cache()
    try {
      // FULL self-dedup: every in-cluster pair is a candidate
      val candFull = DS.candidatePairs(bands).count()
      // INCREMENTAL: delta = 1% of docs (one per tenth cluster); the
      // delta-vs-base band join pairs each delta doc with its 9 base
      // clustermates and NEVER pairs base docs with each other
      val isDelta = pmod(col("doc_id"), lit(100)) === 0
      val candIncr = bands.filter(isDelta)
        .select(col("band"), col("key"), col("doc_id").as("doc_a"))
        .join(bands.filter(!isDelta)
          .select(col("band"), col("key"), col("doc_id").as("doc_b")),
          Seq("band", "key"))
        .select("doc_a", "doc_b").distinct()
      val incrPairs = candIncr.collect().map(r => (r.getLong(0), r.getLong(1)))
      // cost proportionality: 10 delta docs x 9 clustermates vs 100x45
      // in-cluster pairs — incremental must stay ~2% of the full cost
      assert(candFull >= 4000L, s"planted clusters not detected: $candFull")
      assert(incrPairs.length >= 80 && incrPairs.length <= 100, incrPairs.length.toString)
      assert(incrPairs.length <= candFull / 20,
        s"incremental candidates (${incrPairs.length}) not proportional to |delta| (full: $candFull)")
      // the corpus is never self-paired: every candidate is delta-anchored
      assert(incrPairs.forall(_._1 % 100 == 0))
    } finally bands.unpersist()
  }

  test("multimodal decode: PNG IHDR parsed from hand-assembled bytes") {
    // Hand-written container (NOT via synthesizePng, so synth and parse
    // can't share a bug): signature + IHDR with width=640 (0x280),
    // height=480 (0x1e0), bit depth 8, color type 6 (RGBA → 4 channels).
    // The decoder ignores chunk CRCs, so the CRC here is a placeholder.
    val png: Array[Byte] = (Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++ // signature
      Seq(0x00, 0x00, 0x00, 0x0d) ++ // IHDR length 13
      Seq('I', 'H', 'D', 'R').map(_.toInt) ++
      Seq(0x00, 0x00, 0x02, 0x80) ++ // width 640
      Seq(0x00, 0x00, 0x01, 0xe0) ++ // height 480
      Seq(0x08, 0x06, 0x00, 0x00, 0x00) ++ // depth 8, color type 6, deflate/adaptive/none
      Seq(0xde, 0xad, 0xbe, 0xef)) // CRC placeholder
      .map(_.toByte).toArray
    val m = Multimodal.decodeMeta(1L, png)
    assert(m.format == "image/png")
    assert(m.width == 640L && m.height == 480L && m.channels == 4L)
    assert(m.byte_len == png.length.toLong && m.first_byte == 0x89L)
  }

  test("multimodal decode: JPEG SOF0 found behind APP0, big-endian dims") {
    // SOI + APP0/JFIF (decoder must SKIP this via its length field) +
    // SOF0 with height=123 (0x007b), width=456 (0x01c8), 3 components.
    val jpeg: Array[Byte] = (Seq(0xff, 0xd8) ++ // SOI
      Seq(0xff, 0xe0, 0x00, 0x10) ++ // APP0, length 16
      Seq('J', 'F', 'I', 'F', 0).map(_.toInt) ++ Seq(1, 2, 0, 0, 1, 0, 1, 0, 0) ++ // 14 payload bytes
      Seq(0xff, 0xc0, 0x00, 0x11, 0x08) ++ // SOF0, length 17, precision 8
      Seq(0x00, 0x7b) ++ // height 123
      Seq(0x01, 0xc8) ++ // width 456
      Seq(0x03) ++ Seq(1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++ // 3 components
      Seq(0xff, 0xd9)) // EOI
      .map(_.toByte).toArray
    val m = Multimodal.decodeMeta(2L, jpeg)
    assert(m.format == "image/jpeg")
    assert(m.width == 456L && m.height == 123L && m.channels == 3L)
    assert(m.first_byte == 0xffL)
  }

  test("multimodal decode: JPEG fill bytes, TEM, and EOI-before-SOF (T.81 edges)") {
    // TEM (FF 01) and RSTn are standalone; fill bytes (FF FF FF) pad before
    // a marker; a stream whose EOI arrives before any SOF has no dims
    val withTemAndFill: Array[Byte] = (Seq(0xff, 0xd8) ++ // SOI
      Seq(0xff, 0x01) ++ // TEM, standalone — must NOT be read as a segment
      Seq(0xff, 0xff, 0xff, 0xe0, 0x00, 0x04, 0, 0) ++ // fill bytes + APP0 len 4
      Seq(0xff, 0xc0, 0x00, 0x11, 0x08) ++
      Seq(0x00, 0x07) ++ Seq(0x00, 0x09) ++ // height 7, width 9
      Seq(0x03) ++ Seq(1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
      .map(_.toByte).toArray
    val m = Multimodal.decodeMeta(8L, withTemAndFill)
    assert(m.format == "image/jpeg" && m.width == 9L && m.height == 7L)
    // EOI straight after SOI: previously parsed as a length-bearing segment
    // (reading payload bytes as a length); must cleanly report no dims
    val eoiOnly = Seq(0xff, 0xd8, 0xff, 0xd9).map(_.toByte).toArray
    val e = Multimodal.decodeMeta(9L, eoiOnly)
    assert(e.format == "application/octet-stream" && e.width == 0L)
  }

  test("multimodal decode: synthesized containers round-trip their declared dims") {
    val body = "hello world, the entropy-coded stand-in".getBytes("UTF-8")
    val png = Multimodal.decodeMeta(3L, Multimodal.synthesizePng(1023, 7, body))
    assert(png.format == "image/png" && png.width == 1023L && png.height == 7L
      && png.channels == 3L && png.byte_len == body.length + 57L)
    val jpg = Multimodal.decodeMeta(4L, Multimodal.synthesizeJpeg(800, 600, body))
    assert(jpg.format == "image/jpeg" && jpg.width == 800L && jpg.height == 600L
      && jpg.channels == 3L && jpg.byte_len == body.length + 23L)
    // synthesizePayload keys dims off doc_id (even → PNG, odd → JPEG)
    val even = Multimodal.decodeMeta(10L, Multimodal.synthesizePayload(10L, body))
    assert(even.format == "image/png" && even.width == 11L
      && even.height == 1L + (10L * 7L + body.length) % 1024L)
    val odd = Multimodal.decodeMeta(11L, Multimodal.synthesizePayload(11L, body))
    assert(odd.format == "image/jpeg" && odd.width == 12L)
  }

  test("png pixel decoder: hand-built fixtures pin all 5 filter types (spec §9)") {
    // decoder vs the PNG SPEC, not vs our encoder: filtered bytes below are
    // computed by hand so a symmetric filter/unfilter bug cannot hide.
    // 2-pixel-wide truecolor rows, bpp=3; prior row for non-first rows.
    def onePng(height: Int, filtered: Array[Byte], width: Int = 2): Array[Byte] = {
      val defl = new java.util.zip.Deflater()
      defl.setInput(filtered); defl.finish()
      val buf = new Array[Byte](1024)
      val z = new java.io.ByteArrayOutputStream()
      while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
      defl.end()
      Multimodal.pngFixture(width, height, z.toByteArray)
    }
    // row0 raw = [10 20 30 | 40 50 60]
    // Sub (ft=1): d[x] = raw[x] - raw[x-3] → [10 20 30 | 30 30 30]
    val sub = onePng(1, Array[Byte](1, 10, 20, 30, 30, 30, 30))
    assert(Multimodal.decodePngPixels(sub).map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60))
    // Up (ft=2) row1 raw = [11 22 33 | 44 55 66] over prior row0 None
    // d[x] = raw[x] - prior[x] → [1 2 3 | 4 5 6]
    val up = onePng(2, Array[Byte](0, 10, 20, 30, 40, 50, 60,
      2, 1, 2, 3, 4, 5, 6))
    assert(Multimodal.decodePngPixels(up).map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 11, 22, 33, 44, 55, 66))
    // Average (ft=3) row1 raw = [12 24 36 | 48 60 72] over row0
    // d[0..2] = raw - floor((0 + prior)/2) = [12-5 24-10 36-15] = [7 14 21]
    // d[3..5] = raw - floor((left + prior)/2) = [48-(12+40)/2 60-(24+50)/2 72-(36+60)/2] = [22 23 24]
    val avg = onePng(2, Array[Byte](0, 10, 20, 30, 40, 50, 60,
      3, 7, 14, 21, 22, 23, 24))
    assert(Multimodal.decodePngPixels(avg).map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 12, 24, 36, 48, 60, 72))
    // Paeth (ft=4) row1 raw = [13 26 39 | 52 65 78] over row0.
    // x<3: a=0,c=0 → p=b → predictor=b(prior): d = raw - prior = [3 6 9]
    // x>=3: a=left raw, b=prior, c=prior-left:
    //  x=3: a=13 b=40 c=10 p=43 pa=30 pb=3 pc=33 → b → d=52-40=12
    //  x=4: a=26 b=50 c=20 p=56 pa=30 pb=6 pc=36 → b → d=65-50=15
    //  x=5: a=39 b=60 c=30 p=69 pa=30 pb=9 pc=39 → b → d=78-60=18
    val pae = onePng(2, Array[Byte](0, 10, 20, 30, 40, 50, 60,
      4, 3, 6, 9, 12, 15, 18))
    assert(Multimodal.decodePngPixels(pae).map(_ & 0xff).toSeq ==
      Seq(10, 20, 30, 40, 50, 60, 13, 26, 39, 52, 65, 78))
    // modulo-256 wraparound on Sub: raw = [200 0 0 | 100 0 0] → d[3] = 100-200 = -100 ≡ 156
    val wrap = onePng(1, Array[Byte](1, 200.toByte, 0, 0, 156.toByte, 0, 0))
    assert(Multimodal.decodePngPixels(wrap).map(_ & 0xff).toSeq ==
      Seq(200, 0, 0, 100, 0, 0))
  }

  test("png pixel codec: encoder→decoder round-trip equals the closed-form raster") {
    // the e2e contract the multimodal_transform oracle relies on
    for ((w, h, seed) <- Seq((1, 1, 0L), (5, 7, 3L), (32, 32, 123L))) {
      val px = Multimodal.decodePngPixels(Multimodal.synthesizePngPixels(w, h, seed))
      assert(px.length == w * h * 3)
      px.indices.foreach { i =>
        assert((px(i) & 0xff) == Multimodal.pixelByte(i.toLong, seed),
          s"w=$w h=$h i=$i")
      }
    }
  }

  test("multimodal decode: non-media bytes fall through to opaque binary") {
    val m = Multimodal.decodeMeta(7L, "hello world, not a png payload!!".getBytes("UTF-8"))
    assert(m.format == "application/octet-stream")
    assert(m.width == 0L && m.height == 0L && m.channels == 0L)
    assert(m.byte_len == 32L && m.first_byte == 'h'.toLong)
    val empty = Multimodal.decodeMeta(8L, Array.emptyByteArray)
    assert(empty.byte_len == 0L && empty.first_byte == 0L
      && empty.format == "application/octet-stream")
    // a truncated PNG (signature only, no IHDR) must not crash
    val trunc = Multimodal.decodeMeta(9L,
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    assert(trunc.format == "application/octet-stream" && trunc.width == 0L)
    // an adversarial chunk length >= 2^31 (0xFFFFFFF4) must terminate, not
    // loop: the 32-bit step would be negative without the bounds guard
    val evil = Multimodal.decodeMeta(10L,
      (Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
        Seq(0xff, 0xff, 0xff, 0xf4) ++ Seq('A', 'A', 'A', 'A').map(_.toInt))
        .map(_.toByte).toArray)
    assert(evil.format == "application/octet-stream" && evil.width == 0L)
  }

  test("KLL sketches: shard-merge quantiles stay within the rank bound") {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val n = 10000
    // two shards built independently, merged through the serialized form
    // (exactly what the aggregate's partial/merge path does)
    val a = KllDoublesSketch.newHeapInstance(200)
    val b = KllDoublesSketch.newHeapInstance(200)
    (0 until n).foreach { i =>
      val v = ((i * 2654435761L) % n).toDouble   // deterministic shuffle
      if (i % 2 == 0) a.update(v) else b.update(v)
    }
    val merged = KllDoublesSketch.heapify(Memory.wrap(a.toByteArray))
    merged.merge(KllDoublesSketch.heapify(Memory.wrap(b.toByteArray)))
    assert(merged.getN == n)
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val est = merged.getQuantile(p)
      val rank = est / n           // values are the uniform 0..n-1 permuted
      // 0.05 vs the ~1.65% 99%-confidence bound: KLL compaction draws
      // unseeded randomness, so leave margin against per-run flakes
      assert(math.abs(rank - p) <= 0.05, s"p=$p est=$est rank=$rank")
    }
  }

  test("theta intersect aggregate: serde round-trip preserves both sides") {
    import graft.functions.ThetaIntersectAgg
    import org.apache.spark.sql.GraftColumnBridge
    val agg = ThetaIntersectAgg(
      GraftColumnBridge.expression(org.apache.spark.sql.functions.col("v")),
      GraftColumnBridge.expression(org.apache.spark.sql.functions.col("s")))
    val buf = agg.createAggregationBuffer()
    (1L to 600L).foreach(buf._1.update)     // A = 1..600
    (401L to 1000L).foreach(buf._2.update)  // B = 401..1000, |A∩B| = 200
    val restored = agg.deserialize(agg.serialize(buf))
    val merged = agg.merge(agg.createAggregationBuffer(), restored)
    val row = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    // below nominal entries the sketch is exact
    assert(row.getDouble(0) == 600.0 && row.getDouble(1) == 600.0 &&
      row.getDouble(2) == 200.0)
  }
}
