package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is deterministic and content-sensitive") {
    val fp = SparkEntry.queries("q32_fingerprint")
    val a = fp(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = fp(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    assert(a.map(_._2).distinct.length > a.length / 2, "fingerprints should mostly differ")
    assert(a.forall { case (_, v) => v >= 0 && v < 1000003 })
  }

  test("token stats: totals consistent with per-doc quality counts") {
    val quality = SparkEntry.queries("q30_quality_score")(spark, sf)
    val totalTokens = quality.agg(sum("n_tokens")).first().getLong(0)
    val stats = SparkEntry.queries("q31_token_stats")(spark, sf)
    val statsTotal = stats.agg(sum("total_tokens")).first().getLong(0)
    assert(totalTokens == statsTotal)
  }

  test("lang id covers every document exactly once") {
    val conf = SparkEntry.queries("q29_lang_id")(spark, sf)
    val n = conf.agg(sum("n")).first().getLong(0)
    assert(n == spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("tfidf: exact linear-idf scores, tie ordering, null-text exclusion") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry durian"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.ops.TextOps.tfidfTopTerms(docs, k = 2).collect()
    val byDoc = out.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1))
        .map(r => (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toSeq)
      .toMap
    // N = 3 live docs; df: apple 1, banana 2, cherry 2, durian 1
    assert(!byDoc.contains(4L), "null-text doc contributes nothing")
    assert(byDoc(1L) == Seq(("apple", 2L, 1L, 6.0), ("banana", 1L, 2L, 1.5)))
    // exact score ties break on term ascending — deterministic in both engines
    assert(byDoc(2L) == Seq(("banana", 1L, 2L, 1.5), ("cherry", 1L, 2L, 1.5)))
    assert(byDoc(3L) == Seq(("cherry", 2L, 2L, 3.0), ("durian", 1L, 1L, 3.0)))
  }

  test("multimodal decode: deterministic, partition-count invariant, real formats") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = MultimodalOps.mediaTable(docs)
    val once = MultimodalOps.decodeFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    val again = MultimodalOps.decodeFeatures(spark, media.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(once.sameElements(again), "decode must not depend on partitioning")
    // every live doc renders a valid image; parity picks the format
    val live = once.filter(_.format != "unknown")
    assert(live.nonEmpty)
    assert(live.forall(f => f.width >= 4 && f.height >= 4 && f.channels == 3))
    assert(live.forall(f =>
      f.format == (if (f.doc_id % 2 == 0) "ppm" else "bmp")))
    assert(live.forall(f =>
      f.mean_r >= 0 && f.mean_r <= 255 && f.mean_b >= 0 && f.mean_b <= 255))
  }

  test("image codec decodes hand-built PPM/BMP exactly and rejects corrupt bytes") {
    import graft.functions.ImageCodec
    // 2x2 PPM with known pixels: rows (R=10,G=20,B=30),(40,50,60) /
    // (70,80,90),(100,110,120) -> means R=55 G=65 B=75
    val pix = Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
      .map(_.toByte)
    val ppm = ImageCodec.decode(ImageCodec.encodePpm(2, 2, pix)).get
    assert(ppm.format == "ppm" && ppm.width == 2 && ppm.height == 2)
    assert((ppm.sumR, ppm.sumG, ppm.sumB) == (220L, 260L, 300L))
    // PPM with comments + extra whitespace in the header parses too
    val commented = ("P6\n# a comment\n 2\t2 # trailing\n255\n").getBytes("US-ASCII") ++ pix
    assert(ImageCodec.decode(commented).contains(ppm))
    // 3x2 BMP: odd width forces 4-byte row padding (rowSize 12, 3 pad
    // bytes); encoder writes bottom-up BGR, decoder must recover the sums
    val pix32 = Array.tabulate(3 * 2 * 3)(i => (i * 7 + 1).toByte)
    val bmp = ImageCodec.decode(ImageCodec.encodeBmp(3, 2, pix32)).get
    assert(bmp.format == "bmp" && bmp.width == 3 && bmp.height == 2)
    val (er, eg, eb) = (0 until 6).foldLeft((0L, 0L, 0L)) { case ((r, g, b), p) =>
      (r + (pix32(p * 3) & 0xff), g + (pix32(p * 3 + 1) & 0xff),
        b + (pix32(p * 3 + 2) & 0xff))
    }
    assert((bmp.sumR, bmp.sumG, bmp.sumB) == ((er, eg, eb)))
    // total on garbage: truncated pixel array, bad magic, wrong bpp, null
    val truncated = ImageCodec.encodePpm(2, 2, pix).dropRight(1)
    assert(ImageCodec.decode(truncated).isEmpty)
    assert(ImageCodec.decode("JFIF not supported here".getBytes).isEmpty)
    val bmp8 = ImageCodec.encodeBmp(3, 2, pix32).clone()
    bmp8(28) = 8 // claim 8-bit palette -> must reject, not mis-walk
    assert(ImageCodec.decode(bmp8).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array[Byte]('P', '6')).isEmpty)
    // crafted header claiming ~1G-pixel width: the w*3 / rowSize*h
    // arithmetic would overflow Int/Long — must reject cleanly, not crash
    val huge = ImageCodec.encodeBmp(3, 2, pix32).clone()
    huge(18) = 0; huge(19) = 0; huge(20) = 0; huge(21) = 0x40 // w = 2^30
    assert(ImageCodec.decode(huge).isEmpty)
    // PPM with an overflowing pixel-count claim rejects the same way
    assert(ImageCodec.decode("P6\n1000000000 1000000000\n255\n".getBytes).isEmpty)
  }

  test("pixel decode recovers exact RGB layout from both containers") {
    import graft.functions.ImageCodec
    // 3x2 with distinct per-pixel values: pixel (x,y) has R=10(y*3+x),
    // G=R+1, B=R+2 — position-sensitive, so any row flip or channel
    // swap the codec failed to undo changes the array
    val pix = Array.tabulate(3 * 2 * 3) { i =>
      val p = i / 3; (10 * p + i % 3).toByte
    }
    val fromPpm = ImageCodec.decodePixels(ImageCodec.encodePpm(3, 2, pix)).get
    assert(fromPpm.format == "ppm" && fromPpm.width == 3 && fromPpm.height == 2)
    assert(fromPpm.pix.toSeq == pix.toSeq)
    // BMP stores bottom-up BGR with row padding: decodePixels must
    // return the identical top-down RGB array
    val fromBmp = ImageCodec.decodePixels(ImageCodec.encodeBmp(3, 2, pix)).get
    assert(fromBmp.format == "bmp" && fromBmp.pix.toSeq == pix.toSeq)
    // top-down BMP (negative height) keeps rows unflipped
    val td = ImageCodec.encodeBmp(3, 2, pix).clone()
    // rewrite height +2 -> -2 (LE int at offset 22)
    td(22) = 0xfe.toByte; td(23) = 0xff.toByte
    td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val topDown = ImageCodec.decodePixels(td).get
    // encoder wrote bottom-up rows; reading them as top-down swaps rows
    val swapped = pix.grouped(3 * 3).toSeq.reverse.flatten
    assert(topDown.pix.toSeq == swapped)
    // total on garbage, like decode()
    assert(ImageCodec.decodePixels(null).isEmpty)
    assert(ImageCodec.decodePixels("nope".getBytes).isEmpty)
    assert(ImageCodec.decodePixels(
      ImageCodec.encodePpm(3, 2, pix).dropRight(1)).isEmpty)
  }

  test("nearest-neighbor resize uses the floor(x*w/ow) index map exactly") {
    import graft.functions.ImageCodec
    // 4x4 source where pixel (x,y) has value (y*4+x) on all channels;
    // downsample to 2x2: output (ox,oy) samples source (ox*2, oy*2)
    val src = ImageCodec.DecodedPixels("ppm", 4, 4,
      Array.tabulate(4 * 4 * 3)(i => (i / 3).toByte))
    val out = ImageCodec.resizeNearest(src, 2, 2)
    assert(out.grouped(3).map(_(0) & 0xff).toSeq == Seq(0, 2, 8, 10))
    // upsample 2x2 -> 4x4 replicates each source pixel 2x2
    val small = ImageCodec.DecodedPixels("ppm", 2, 2,
      Array.tabulate(2 * 2 * 3)(i => (i / 3).toByte))
    val up = ImageCodec.resizeNearest(small, 4, 4)
    assert(up.grouped(3).map(_(0) & 0xff).toSeq ==
      Seq(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3))
    // non-divisible ratio: 3 -> 2 samples floor(0*3/2)=0, floor(1*3/2)=1
    val wide = ImageCodec.DecodedPixels("ppm", 3, 1,
      Array.tabulate(3 * 3)(i => (i / 3).toByte))
    val two = ImageCodec.resizeNearest(wide, 2, 1)
    assert(two.grouped(3).map(_(0) & 0xff).toSeq == Seq(0, 1))
  }

  test("multimodal meta magic_hex is the hex of the first 8 bytes") {
    val out = SparkEntry.queries("q37_multimodal_meta")(spark, sf)
      .limit(5).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").limit(5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val expect = docs(r.getLong(0)).take(8).getBytes("UTF-8")
        .map(b => f"${b}%02X").mkString
      assert(r.getString(2) == expect)
    }
  }

  test("audio codec: hand-built WAV decodes exactly, junk chunks skipped") {
    import graft.functions.AudioCodec
    val samples = Array[Short](100, -200, 300, -32768)
    val plain = AudioCodec.decode(AudioCodec.encodeWav(8000, samples)).get
    assert(plain.sampleRate === 8000 && plain.channels === 1 &&
      plain.bitsPerSample === 16 && plain.nSamples === 4)
    assert(plain.peak === 32768)
    assert(plain.sumSq === 100L * 100 + 200L * 200 + 300L * 300 +
      32768L * 32768)
    // LIST/INFO chunk between fmt and data must not change the result
    val walked = AudioCodec.decode(
      AudioCodec.encodeWav(8000, samples, junkChunk = true)).get
    assert(walked === plain)
  }

  test("audio codec is total: corrupt, truncated and null bytes yield None") {
    import graft.functions.AudioCodec
    assert(AudioCodec.decode(null).isEmpty)
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val good = AudioCodec.encodeWav(8000, Array[Short](1, 2, 3, 4))
    assert(AudioCodec.decode(good.take(good.length - 3)).isEmpty,
      "truncated data chunk must not decode")
    // stereo / non-PCM / 8-bit headers are rejected, not misread
    val stereo = good.clone()
    stereo(22) = 2 // channels field (RIFF 12 + chunk header 8 + audioFormat 2)
    assert(AudioCodec.decode(stereo).isEmpty)
  }

  test("audio decode: synth params recovered bit-exactly, repartition invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = MultimodalOps.decodeAudio(spark,
      MultimodalOps.audioTable(docs)).collect()
    assert(out.nonEmpty)
    val meta = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { f =>
      val n = 50 + (meta(f.doc_id) % 100)
      val amp = 1000 + (f.doc_id % 7) * 3000
      assert(f.format === "wav16")
      assert(f.sample_rate === 8000 + 1000 * (f.doc_id % 4))
      assert(f.n_samples === n)
      assert(f.peak === amp)
      assert(f.sum_sq === n * amp * amp)
    }
    val re = MultimodalOps.decodeAudio(spark,
      MultimodalOps.audioTable(docs.repartition(7))).collect()
    assert(re.sortBy(_.doc_id).toSeq === out.sortBy(_.doc_id).toSeq)
  }

  test("GVID codec: roundtrip, length check, and magic check") {
    import graft.functions.VideoCodec
    val b = VideoCodec.encode(2, 3, 5, (f, x, y) => (f * 10 + x + y) % 256)
    val v = VideoCodec.decode(b).get
    assert(v.width == 2 && v.height == 3 && v.nFrames == 5)
    assert(v.at(0, 0, 0) == 0 && v.at(4, 1, 2) == 43)
    // truncated payload and wrong magic must both decode as None
    assert(VideoCodec.decode(java.util.Arrays.copyOf(b, b.length - 1)).isEmpty)
    val bad = b.clone(); bad(0) = 'X'
    assert(VideoCodec.decode(bad).isEmpty)
    assert(VideoCodec.decode(null).isEmpty)
  }

  test("frame sampling: stride picks every 3rd frame; motion diffs sampled pairs") {
    import spark.implicits._
    // 1x1 video, 7 frames, pixel(f) = f*10: sampled f = 0,3,6 ->
    // luma 0+30+60 = 90, motion |30-0| + |60-30| = 60
    val payload = graft.functions.VideoCodec.encode(1, 1, 7,
      (f, _, _) => f * 10)
    val media = Seq((1L, payload)).toDF("doc_id", "payload")
    val out = MultimodalOps.frameSampleFeatures(spark, media).collect().head
    assert(out == MultimodalOps.VideoFeatures(1L, "gvid", 1, 1, 7, 3, 90L, 60L))
  }

  test("truncated video uploads become corrupt rows, never failed tasks") {
    import spark.implicits._
    val full = graft.functions.VideoCodec.encode(2, 2, 4, (f, x, y) => f + x + y)
    val media = Seq(
      (5L, java.util.Arrays.copyOf(full, full.length - 5)),
      (6L, full))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.frameSampleFeatures(spark, media).collect()
      .sortBy(_.doc_id)
    assert(out(0).format == "corrupt" && out(0).luma_sum == 0L)
    assert(out(1).format == "gvid" && out(1).n_sampled == 2)
  }

  test("media dedup: re-uploads collapse on the decoded signature") {
    // 1 and 98 share media key 1 (mod 97) -> byte-identical renders ->
    // one cluster with canonical 1; key-2 doc stays a singleton (no row)
    val docs = Seq(1L, 98L, 2L).toDF("doc_id")
    val out = MultimodalOps.mediaDedup(spark, docs).collect()
    assert(out.length === 1, s"clusters: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(4) === 1L && r.getLong(5) === 2L,
      s"canonical 1, two members: $r")
  }

  test("perceptual dedup: brightness twins collapse, different pattern survives") {
    // docs 1 and 90 share pattern key 1 (mod 89) at brightness 30 and 0
    // -> different bytes, same mean-centered grid code -> ONE cluster
    // with TWO distinct payload variants; doc 2 (pattern key 2) must not
    // join it
    val docs = Seq(1L, 90L, 2L).toDF("doc_id")
    val out = MultimodalOps.perceptualDedup(spark, docs).collect()
    assert(out.length === 1, s"clusters: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getLong(3) === 1L,
      s"two members, two payload variants, canonical 1: $r")
  }

  test("perceptual hash is brightness-invariant but pattern-sensitive") {
    import spark.implicits._
    // same pattern key at all three brightness grades -> one code;
    // a different pattern key -> a different code
    val variants = Seq((0L, 5L, 0L), (1L, 5L, 30L), (2L, 5L, 60L),
      (3L, 6L, 0L)).toDF("vb", "k", "b")
    val media = MultimodalOps.brightnessImageTable(variants)
    val out = MultimodalOps.perceptualHashes(spark, media).collect()
      .map(p => p.vb -> p.phash).toMap
    assert(out(0L) === out(1L) && out(1L) === out(2L),
      s"brightness variants must share a code: $out")
    assert(out(3L) !== out(0L), s"different pattern must differ: $out")
  }

  test("video fingerprint dedup: brightness + truncated twins collapse, different footage survives") {
    // docs 1, 80, 159 share pattern key 1 (mod 79) as variants 1
    // (brightness +40), 2 (3 tail frames dropped), 0 (base) -> three
    // different byte payloads, ONE (w, h, vhash) cluster with THREE
    // distinct variants; doc 2 (pattern key 2) must not join
    val docs = Seq(1L, 80L, 159L, 2L).toDF("doc_id")
    val out = MultimodalOps.videoFingerprintDedup(spark, docs).collect()
    assert(out.length === 1, s"clusters: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(3) === 3L && r.getLong(4) === 3L && r.getLong(5) === 1L,
      s"three members, three variants, canonical 1: $r")
  }

  test("video fingerprint is brightness/truncation-invariant, footage-sensitive, corrupt-total") {
    import spark.implicits._
    val variants = Seq((0L, 5L, 0L), (1L, 5L, 1L), (2L, 5L, 2L),
      (3L, 6L, 0L)).toDF("vb", "k", "vr")
    val out = MultimodalOps.videoFingerprints(
        spark, MultimodalOps.variantVideoTable(variants)).collect()
      .map(p => p.vb -> ((p.width, p.height, p.vhash))).toMap
    assert(out(0L) === out(1L) && out(0L) === out(2L),
      s"brightness and truncated variants must share the signature: $out")
    assert(out(3L) !== out(0L), s"different footage must differ: $out")
    assert(out(0L)._3 >= 0L, s"real code is non-negative: $out")
    // corrupt payloads degrade to vhash = -1, never a real code
    val junk = Seq((9L, "not a video".getBytes)).toDF("vb", "payload")
    val bad = MultimodalOps.videoFingerprints(spark, junk).collect().head
    assert(bad.format === "corrupt" && bad.vhash === -1L)
    // discrimination across the whole key space: the 79 base patterns
    // must spread over many signatures, or "different footage
    // survives" would hold only on the hand-picked pair above
    val all = (0L until 79L).map(k => (k, k, 0L)).toDF("vb", "k", "vr")
    val sigs = MultimodalOps.videoFingerprints(
        spark, MultimodalOps.variantVideoTable(all)).collect()
      .map(p => (p.width, p.height, p.vhash)).distinct
    info(s"distinct signatures over 79 patterns: ${sigs.length}")
    assert(sigs.length >= 60, s"only ${sigs.length} distinct signatures")
  }

  test("audio fingerprint dedup: volume twins collapse, different rhythm survives") {
    // docs 1 and 84 share rhythm key 1 (mod 83) at amplitudes 4000 and
    // 1000 -> different bytes (and junk-chunk layout is key-driven, so
    // both carry it), same voiced mask -> ONE cluster with TWO payload
    // variants; doc 2 (rhythm key 2, different length) must not join
    val docs = Seq(1L, 84L, 2L).toDF("doc_id")
    val out = MultimodalOps.audioFingerprintDedup(spark, docs).collect()
    assert(out.length === 1, s"clusters: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(2) === 2L && r.getLong(3) === 2L && r.getLong(4) === 1L,
      s"two members, two variants, canonical 1: $r")
  }

  test("audio fingerprint is amplitude-invariant and rhythm-sensitive") {
    import spark.implicits._
    val variants = Seq((0L, 5L, 0L), (1L, 5L, 1L), (2L, 12L, 0L))
      .toDF("vb", "k", "par")
    val media = MultimodalOps.rhythmAudioTable(variants)
    val out = MultimodalOps.audioFingerprints(spark, media).collect()
      .map(p => p.vb -> ((p.fp, p.nw))).toMap
    assert(out(0L) === out(1L), s"amplitude grades must share a mask: $out")
    assert(out(2L) !== out(0L), s"different rhythm must differ: $out")
    // k=5 (bits 101): phases p with p%7 in {0, 2} silent; n = 85 -> nw 6;
    // voiced windows {1, 3, 4, 5, 6}? no - w in 0..5, silent at 0, 2 ->
    // mask = 2 + 8 + 16 + 32 = 58
    assert(out(0L) === ((58L, 6)), s"hand-computed mask for k=5: $out")
  }

  test("audio segmentation: silence splits, tail clamps, corrupt yields none") {
    import graft.functions.AudioCodec
    // 40 samples at 1000 Hz, window 16: w0 voiced, w1 silent, w2 voiced
    // (PARTIAL: 8 samples) -> two 1-window segments; end of seg 2 clamps
    // to sample 40, not window boundary 48
    val samples = Array.tabulate(40)(i =>
      if (i < 16 || i >= 32) 500.toShort else 0.toShort)
    val wav = AudioCodec.encodeWav(1000, samples)
    val media = Seq(
      (1L, wav),
      (2L, "not a wav".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.audioSegments(spark, media).collect()
      .sortBy(s => (s.doc_id, s.seg_idx))
    assert(out.length === 2, s"segments: ${out.toSeq}")
    assert(out(0) === MultimodalOps.AudioSegment(1L, 1, 0L, 16000L, 1))
    assert(out(1) === MultimodalOps.AudioSegment(1L, 2, 32000L, 40000L, 1))
  }

  test("q317 MIH equals brute force — the pigeonhole exactness, on real data") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = MultimodalOps.hammingNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getBoolean(3)))).toMap
    // brute force over the variant-bounded code relation (≤ 178 codes)
    val keyed = docs.select(
      (col("doc_id") % 89).as("k"), (col("doc_id") % 2).as("n"),
      ((col("doc_id") % 89) * 2 + col("doc_id") % 2).as("vb")).distinct()
    val codes = MultimodalOps.perceptualHashes(
        spark, MultimodalOps.noiseImageTable(keyed))
      .collect().map(p => p.vb -> p.phash).toMap
    val ks = keyed.collect().map(r => r.getAs[Long]("vb") -> r.getAs[Long]("k")).toMap
    val brute = (for {
      a <- codes.keys; b <- codes.keys if a < b
      d = java.lang.Long.bitCount(codes(a) ^ codes(b)) if d <= 3
    } yield (a, b) -> ((d, ks(a) == ks(b)))).toMap
    assert(out === brute, "MIH missed or invented a pair vs brute force")
    assert(out.nonEmpty, "radius-3 population is empty — fixture degenerate")
    assert(out.values.forall(_._1 <= 3))
    // non-vacuity of the noise tier: at least one same-pattern pair sits
    // STRICTLY inside the radius band (0 < hamming <= 3) — the hot-pixel
    // twin the radius search exists for
    assert(out.exists { case (_, (d, same)) => same && d >= 1 },
      s"no noisy same-pattern pair within radius: ${out.take(8)}")
  }

  test("q317 bands: a 4-bits-across-4-bands pair is OUT at radius 3 by design") {
    // pure pigeonhole boundary check on the band decomposition itself:
    // codes differing in exactly one bit PER band share no band, and
    // their Hamming distance is 4 > radius — MIH correctly has no
    // obligation to find them, and the verify would cut them anyway
    val a = 0L
    val b = (1L << 0) | (1L << 8) | (1L << 16) | (1L << 24)
    assert(java.lang.Long.bitCount(a ^ b) === 4)
    val bandsA = (0 until 4).map(i => (a >> (8 * i)) & 255)
    val bandsB = (0 until 4).map(i => (b >> (8 * i)) & 255)
    assert(bandsA.zip(bandsB).forall { case (x, y) => x != y },
      "the adversarial pair must share no band")
  }

  test("q341 mojibake census: planted artifacts count exactly, clean source zero") {
    import graft.ops.TextOps
    import spark.implicits._
    val srcOnly = TextOps.mojibakeTexts.toDF("doc_id", "source", "text")
    val out = TextOps.mojibakeCensus(srcOnly).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // srcM: 4 accent artifacts + 3 curly-punct artifacts + 2 NBSP
    // artifacts across 3 of 4 docs; srcN fully clean
    assert(out("srcM") === ((4L, 3L, 9L)),
      s"planted artifact counts drifted: $out")
    assert(out("srcN") === ((1L, 0L, 0L)),
      s"the clean source must census zero: $out")
  }

  test("q342 char entropy: constant text is 0 bits, 16 equal chars exactly 4") {
    import graft.ops.TextOps
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),                  // one symbol -> H = 0 exactly
      (2L, "abcdefghijklmnop"),      // 16 equiprobable -> H = 4e6 exactly
      (3L, null.asInstanceOf[String])) // out of scope
      .toDF("doc_id", "text")
    val out = graft.ops.TextOps.charEntropyBands(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 1L, 0L, 0L), (8L, 1L, 4000000L, 4000000L)),
      s"hand-computed entropy bands drifted: ${out.toSeq}")
  }
}
