package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  lazy val media = Seq(
    (1L, Array[Byte](0, 63, 64, -128, -1), 640, 480, 9), // bytes 0,63,64,128,255
    (2L, Array[Byte](), 100, 300, 0),
    (3L, Array[Byte](10, 10, 10), 224, 224, 2))
    .toDF("media_id", "payload", "w", "h", "nf")
    .withColumn("meta", struct($"w".as("width"), $"h".as("height"), $"nf".as("n_frames")))

  test("decode stub produces per-byte histograms with exact batch shape") {
    val out = Multimodal.decodeFeatures(media, batchSize = 2).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val m1 = out(1L)
    assert(m1.getAs[Int]("n_bytes") == 5)
    assert((m1.getAs[Int]("bin0"), m1.getAs[Int]("bin1"),
      m1.getAs[Int]("bin2"), m1.getAs[Int]("bin3")) == (2, 1, 1, 1))
    assert(m1.getAs[Double]("mean_byte") == (0 + 63 + 64 + 128 + 255) / 5.0)
    assert(out(2L).getAs[Int]("n_bytes") == 0) // empty payload survives
  }

  test("decodeBatch is called with whole batches (vectorized shape)") {
    val batch = Seq((1L, Array[Byte](1, 2)), (2L, Array[Byte](3)))
    val res = Multimodal.decodeBatch(batch)
    assert(res.map(_.media_id) == Seq(1L, 2L)) // order preserved
  }

  test("resize planning preserves aspect ratio and never upsizes past bound") {
    val out = Multimodal.resizePlan(media, maxSide = 224).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))).toMap
    assert(out(1L) == (224, 168)) // 640x480 -> fit width, 480*224/640
    assert(out(2L) == (74, 224))  // portrait: fit height, 100*224/300
    assert(out(3L) == (224, 224)) // already at bound
  }

  test("frame sampling emits stride-spaced indices, capped, skipping empties") {
    val out = Multimodal.frameSample(media, stride = 3, maxFrames = 2).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == Seq(0, 3)) // capped at 2 of 0,3,6
    assert(!out.exists(_._1 == 2L)) // n_frames = 0 -> no rows
    assert(out.filter(_._1 == 3L).map(_._2).toSeq == Seq(0))
  }

  test("metadata-only ops prune the binary column at scan") {
    val plan = Multimodal.resizePlan(media, 224).queryExecution.optimizedPlan.toString()
    assert(!plan.contains("payload"))
  }

  private def hexBytes(hx: String): Array[Byte] =
    hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("parseImageHeader reads PNG IHDR dimensions from the bytes") {
    // 800x600, standard signature + IHDR-first layout
    val png = hexBytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000320" + "00000258" + "0806000000" + "DEADBEEF")
    assert(Multimodal.parseImageHeader(png) == ("png", Some(800), Some(600)))
    // signature intact but truncated before IHDR -> detected, no dims
    assert(Multimodal.parseImageHeader(png.take(10)) == ("png", None, None))
  }

  test("parseImageHeader walks JPEG segments by their length fields to the SOF") {
    def seg(marker: String, payloadHex: String): String = {
      val len = payloadHex.length / 2 + 2
      f"$marker$len%04X$payloadHex"
    }
    // TWO APP segments of different lengths before SOF0 - the walk must
    // follow each segment's own length field, not assume a fixed layout
    val jpeg = hexBytes("FFD8" +
      seg("FFE0", "4A4649460001010000010001" + "0000") +
      seg("FFE1", "45786966000049492A00") + // Exif APP1
      seg("FFC0", "08" + "01A4" + "0230" + "03011100021101031101") + // h=420 w=560
      "FFD9")
    assert(Multimodal.parseImageHeader(jpeg) == ("jpeg", Some(560), Some(420)))
    // progressive (SOF2) parses the same frame-header shape
    val prog = hexBytes("FFD8" + seg("FFC2", "08" + "0010" + "0020" + "03011100021101031101"))
    assert(Multimodal.parseImageHeader(prog) == ("jpeg", Some(32), Some(16)))
    // SOI but garbage after -> detected jpeg, no dims, NO exception
    assert(Multimodal.parseImageHeader(hexBytes("FFD8" + "0102")) == ("jpeg", None, None))
    // truncated mid-segment
    assert(Multimodal.parseImageHeader(jpeg.take(8)) == ("jpeg", None, None))
  }

  private def le16(x: Int) = f"${x & 0xff}%02X${(x >> 8) & 0xff}%02X"
  private def le32(x: Int) =
    f"${x & 0xff}%02X${(x >> 8) & 0xff}%02X${(x >> 16) & 0xff}%02X${(x >> 24) & 0xff}%02X"

  test("parseWavHeader reads fmt/data chunks little-endian, walking other chunks") {
    def fmt(ch: Int, rate: Int, bits: Int) = {
      val block = ch * bits / 8
      "666D7420" + le32(16) + le16(1) + le16(ch) + le32(rate) +
        le32(rate * block) + le16(block) + le16(bits)
    }
    // plain: RIFF/WAVE, fmt, data declaring 400 bytes (stereo 16-bit ->
    // block 4 -> 100 frames); sample bytes ABSENT (header-only payload)
    val plain = hexBytes("52494646" + le32(4 + 24 + 8 + 400) + "57415645" +
      fmt(2, 44100, 16) + "64617461" + le32(400))
    assert(Multimodal.parseWavHeader(plain) ==
      ("wav", Some(2), Some(44100), Some(16), Some(100L)))
    // an ODD-sized LIST chunk before fmt: the walk must pad to even
    val listed = hexBytes("52494646" + le32(4 + 8 + 5 + 1 + 24 + 8 + 6) + "57415645" +
      "4C495354" + le32(5) + "494E464F00" + "00" + // 5-byte payload + pad
      fmt(1, 8000, 8) + "64617461" + le32(6))
    assert(Multimodal.parseWavHeader(listed) ==
      ("wav", Some(1), Some(8000), Some(8), Some(6L)))
    // RIFF but truncated before fmt completes -> detected, no fields
    assert(Multimodal.parseWavHeader(plain.take(20)) == ("wav", None, None, None, None))
    // not RIFF at all
    assert(Multimodal.parseWavHeader("RIFX1234WAVE".getBytes) ==
      ("unknown", None, None, None, None))
    assert(Multimodal.parseWavHeader(Array.empty[Byte]) ==
      ("unknown", None, None, None, None))
  }

  private def be32(x: Int) = f"$x%08X"

  test("parseMp4Header walks boxes to moov/mvhd, skipping free and iods") {
    def mvhd(ts: Int, dur: Int, version: Int = 0) =
      be32(28) + "6D766864" + f"$version%02X" + "000000" +
        "00000000" + "00000000" + be32(ts) + be32(dur)
    val ftyp = be32(16) + "66747970" + "69736F6D" + "00000200"
    // plain: ftyp + moov(mvhd): 600 units/s, 1800 units -> 3000 ms
    val plain = hexBytes(ftyp + be32(36) + "6D6F6F76" + mvhd(600, 1800))
    assert(Multimodal.parseMp4Header(plain) ==
      ("mp4", Some("isom"), Some(600), Some(3000L)))
    // free box before moov, iods child before mvhd - both walks exercised
    val detour = hexBytes(ftyp +
      be32(12) + "66726565" + "00000000" +
      be32(48) + "6D6F6F76" + be32(12) + "696F6473" + "00000000" + mvhd(1000, 2500))
    assert(Multimodal.parseMp4Header(detour) ==
      ("mp4", Some("isom"), Some(1000), Some(2500L)))
    // version-1 mvhd (64-bit times) is detected mp4 but yields no fields
    val v1 = hexBytes(ftyp + be32(36) + "6D6F6F76" + mvhd(600, 1800, version = 1))
    assert(Multimodal.parseMp4Header(v1) == ("mp4", Some("isom"), None, None))
    // truncated mid-moov; and a non-mp4 blob
    assert(Multimodal.parseMp4Header(plain.take(20)) == ("mp4", Some("isom"), None, None))
    assert(Multimodal.parseMp4Header("not an mp4 file!".getBytes) ==
      ("unknown", None, None, None))
  }

  test("parseImageHeader: non-image payloads are unknown, never throw") {
    assert(Multimodal.parseImageHeader(Array.empty[Byte]) == ("unknown", None, None))
    assert(Multimodal.parseImageHeader(Array[Byte](0, 1, 2)) == ("unknown", None, None))
    val out = Multimodal.imageHeaders(media.select($"media_id", $"payload"))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    assert(out == Map(1L -> "unknown", 2L -> "unknown", 3L -> "unknown"))
  }

  test("parseWavHeader terminates on corrupt u32 chunk sizes (no hang, no throw)") {
    def fmt16 = "666D7420" + le32(16) + le16(1) + le16(2) + le32(44100) +
      le32(44100 * 4) + le16(4) + le16(16)
    // a junk chunk whose u32 size 0xFFFFFFF8 truncated to Int is -8:
    // the old walk advanced 8 + (-8) + 0 = 0 forever; must now terminate
    val stall = hexBytes("52494646" + le32(100) + "57415645" +
      "4A554E4B" + "F8FFFFFF" + "00000000")
    assert(Multimodal.parseWavHeader(stall) == ("wav", None, None, None, None))
    // size 0x80000004 drove the Int cursor negative -> AIOOBE; must terminate
    val neg = hexBytes("52494646" + le32(100) + "57415645" +
      fmt16 + "4A554E4B" + "04000080" + "00000000")
    assert(Multimodal.parseWavHeader(neg) ==
      ("wav", Some(2), Some(44100), Some(16), None))
  }

  test("parseMp4Header terminates on corrupt u32 box sizes in both walks") {
    val ftyp = be32(16) + "66747970" + "69736F6D" + "00000200"
    // top-level box size 2^31+16: old walk added size.toInt (negative)
    val top = hexBytes(ftyp + "80000010" + "6A756E6B" + "00000000")
    assert(Multimodal.parseMp4Header(top) == ("mp4", Some("isom"), None, None))
    // moov child with the same corrupt size: child walk must bail, not loop
    val child = hexBytes(ftyp + be32(20) + "6D6F6F76" + "FFFFFFF0" + "6A756E6B" + "00000000")
    assert(Multimodal.parseMp4Header(child) == ("mp4", Some("isom"), None, None))
    // sizes 1-7 (not the 0 to-EOF terminal) are structurally impossible -> terminal
    val tiny = hexBytes(ftyp + be32(4) + "6A756E6B")
    assert(Multimodal.parseMp4Header(tiny) == ("mp4", Some("isom"), None, None))
  }

  test("parseImageHeader skips JPEG fill bytes and standalone markers before SOF") {
    // spec-legal 0xFF padding between segments: FF D8 (SOI), a fill FF,
    // then SOF0 - the old walk misread the fill as a marker+length
    val padded = hexBytes("FFD8" + "FF" + "FFC0" + "000B" + "08" + "0010" + "0020" + "030111")
    assert(Multimodal.parseImageHeader(padded) == ("jpeg", Some(32), Some(16)))
    // a length-less standalone marker (RST0) before the frame header
    val rst = hexBytes("FFD8" + "FFD0" + "FFC0" + "000B" + "08" + "0040" + "0080" + "030111")
    assert(Multimodal.parseImageHeader(rst) == ("jpeg", Some(128), Some(64)))
    // EOI with no SOF: detected jpeg, no dims, no throw
    assert(Multimodal.parseImageHeader(hexBytes("FFD8" + "FFD9")) == ("jpeg", None, None))
    // corrupt zero length field must not loop
    assert(Multimodal.parseImageHeader(hexBytes("FFD8" + "FFE0" + "0000" + "AA")) ==
      ("jpeg", None, None))
  }

  test("phash dedup: hamming within/over threshold, band recall, keeper election") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ascending bytes: every dHash gradient bit is 1
    val base = Array.tabulate(96)(i => i.toByte)
    def bumped(positions: Int*): Array[Byte] = {
      // raising a non-adjacent byte to 200 flips exactly ONE bit each
      // (the forward gradient at that position; the backward one stays 1)
      val b = base.clone(); positions.foreach(p => b(p) = 200.toByte); b
    }
    val media = Seq(
      10L -> base,                                  // anchor
      11L -> bumped(10),                            // hamming 1: dup of 10
      12L -> Array.tabulate(96)(i => (95 - i).toByte), // all-0 bits: singleton
      13L -> base.clone(),                          // identical: dup of 10
      14L -> bumped(20, 23, 26, 29, 32, 35))        // hamming 6 > 4 from anchor
      .toDF("media_id", "payload")
    val out = Multimodal.phashDedup(media, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map(
      10L -> ((10L, false)), 11L -> ((10L, true)), 12L -> ((12L, false)),
      13L -> ((10L, true)), 14L -> ((14L, false))),
      s"keeper election wrong: $out")
    // the hamming-6 media DID share exact bands with the anchor (its
    // first 18 bits are untouched) — it was a candidate, then filtered
    val ph = media.select(col("media_id"),
      Multimodal.phashBits(col("payload")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ph(14L).take(18) == ph(10L).take(18) && ph(14L) != ph(10L))
    assert(ph(10L) == "1" * 72 && ph(12L) == "0" * 72)
    // TRANSITIVE closure: a bridge at hamming 2 from the anchor and 4
    // from the hamming-6 media chains all of them into one component,
    // so the far end collapses too (d(anchor, far) = 6 > threshold) —
    // and no keeper_id ever points at a row that is itself a dup
    val chained = media.unionByName(
      Seq(15L -> bumped(20, 23)).toDF("media_id", "payload"))
    val out2 = Multimodal.phashDedup(chained, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out2 == Map(
      10L -> ((10L, false)), 11L -> ((10L, true)), 12L -> ((12L, false)),
      13L -> ((10L, true)), 14L -> ((10L, true)), 15L -> ((10L, true))),
      s"hamming chain must close transitively onto one keeper: $out2")
    val keepers2 = out2.values.map(_._1).toSet
    assert(keepers2.forall(k => !out2(k)._2),
      s"a keeper_id must never be a dup itself: $out2")
  }

  test("phash dedup: hamming ladders close transitively at any diameter") {
    import org.apache.spark.sql.functions.col
    // an edit LADDER: consecutive rungs differ by 3 bits (<= threshold
    // 4), skipping a rung costs 6 (> threshold) — so the pair graph is
    // a PATH whose diameter grows with ladder length. A 5-rung ladder
    // (diameter 4) converges inside the bounded min-label hop budget;
    // a 9-rung ladder (diameter 8) must fall back to the iterative
    // connected-components machinery — both collapse onto the min id.
    val base = Array.tabulate(96)(i => i.toByte)
    def bumped(positions: Int*): Array[Byte] = {
      val b = base.clone(); positions.foreach(p => b(p) = 200.toByte); b
    }
    // 24 bump positions on a stride-3 grid (2, 5, ..., 71): pairwise
    // non-adjacent, all inside the 73-byte hash window, so every bump
    // flips exactly one bit and steps never interact
    val steps = (0 until 24).map(k => 2 + 3 * k).grouped(3).toSeq
    def ladder(firstId: Long, rungs: Int) = (0 until rungs).map { i =>
      (firstId + i) -> bumped(steps.take(i).flatten: _*)
    }
    for (rungs <- Seq(5, 9)) {
      val media = ladder(100L, rungs)
        .toDF("media_id", "payload")
      val out = Multimodal.phashDedup(media, "media_id", "payload")
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
      val want = (0 until rungs)
        .map(i => (100L + i) -> ((100L, i != 0))).toMap
      assert(out == want, s"ladder of $rungs must collapse onto 100: $out")
    }
  }
}
