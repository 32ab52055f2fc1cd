package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata structs, and
  * decode/feature-extract/resize/frame-sample run as *batched*
  * per-partition operations — the Scala analogue of `mapInPandas`: a
  * whole Arrow-sized batch of payloads crosses into the decode kernel at
  * once, never one JVM call per row.
  *
  * The PIXEL codec is STUBBED (this container ships no image/audio
  * libraries): `decodeBatch` is a deterministic fake that "decodes" a
  * payload into its byte histogram. Header decoding is REAL:
  * [[parseImageHeader]] reads PNG/JPEG container structure (magic,
  * chunk/segment walking, big-endian dimension fields) with pure byte
  * math. Everything around the kernels — the media schema, the binary
  * column, the batch loop shape, the partitioning — is what matters at
  * scale: payload bytes never shuffle (feature extraction is a narrow
  * map), and metadata-only operations (resize planning, frame sampling)
  * touch only the struct column, so Parquet column pruning skips the
  * heavy binary column entirely.
  */
object Multimodal {

  /** A decoded row: payload reduced to fixed-width features. */
  final case class MediaFeatures(
      media_id: Long, n_bytes: Int,
      bin0: Int, bin1: Int, bin2: Int, bin3: Int,
      mean_byte: Double)

  /** STUB decode kernel — deterministic fake standing in for a real
    * vectorized decoder (libjpeg/ffmpeg/…). Takes a whole batch, returns
    * a whole batch; a real implementation would hand `batch` to native
    * code in one call.
    */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val hist = new Array[Int](4)
      var sum = 0L
      bytes.foreach { b =>
        val u = b & 0xff
        hist(u / 64) += 1
        sum += u
      }
      MediaFeatures(id, bytes.length, hist(0), hist(1), hist(2), hist(3),
        if (bytes.isEmpty) 0.0
        else math.rint(sum.toDouble / bytes.length * 1e6) / 1e6)
    }

  /** `mm_decode_features`: batched per-partition decode of a binary
    * payload column into fixed-width features. Batch size bounds peak
    * memory per task regardless of payload sizes.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 128): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }

  /** A parsed image header: container format detected from magic bytes,
    * dimensions decoded from the format's own header structure (None
    * when the payload is not a recognized image or is truncated).
    */
  final case class ImageHeader(
      media_id: Long, format: String, n_bytes: Int,
      width: Option[Int], height: Option[Int])

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** REAL header decode — pure byte math, no codec library:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is required first
    *    (PNG spec §5.6): 4-byte length, 4-byte type, then width and
    *    height as big-endian u32 at byte offsets 16 and 20.
    *  - JPEG: SOI marker `FF D8`, then marker segments are walked by
    *    their OWN 2-byte big-endian length fields (arbitrary APPn/COM
    *    segments before the frame header) until a start-of-frame marker
    *    (C0–CF excluding C4/C8/CC); SOF payload is precision(1),
    *    height(2), width(2).
    *  - anything else: format "unknown", no dimensions.
    *
    * Truncated or structurally corrupt payloads yield the detected
    * format with None dimensions — never an exception (a 100 TB scrape
    * WILL contain malformed files, and one bad byte must not kill a
    * partition).
    */
  /** `mm_image_dedup_phash`: perceptual-hash image dedup — the
    * multimodal twin of text near-dup. The REAL pipeline dHash-es a
    * decoded, resized luma grid; this container ships no image codecs,
    * so the decode step is a DOCUMENTED DETERMINISTIC STUB: the first
    * 73 payload bytes stand in for the luma grid (the Spark-side
    * plumbing — hash construction, banded candidate join, hamming
    * threshold, keeper election — is the real, tested machinery; swap
    * `phashBits`' byte source for a decoder and nothing else moves).
    *
    * dHash: bit i = byte(i+1) > byte(i) for i in 1..72 — gradient
    * signs, robust to uniform brightness/level shifts. The 72-bit hash
    * rides as a bitstring column; banding splits it into the smallest
    * divisor-of-72 band count ABOVE maxHamming, so by pigeonhole (h
    * flipped bits can dirty at most h bands) every pair within the
    * threshold shares at least one exact band — the recall guarantee
    * is exact, not heuristic, and it is the band COUNT that must
    * exceed the distance, not the band width. Candidate pairs then
    * filter by true hamming, and duplicate groups close TRANSITIVELY
    * through the shared min-label connected components (a hamming
    * chain A~B~C collapses to one keeper even when d(A,C) exceeds the
    * threshold — the standard near-dup clustering semantics). All
    * map-side except one bounded band equi-join — never all-pairs.
    */
  // native one-pass dHash bit assembly (== the former 72-term
  // when(conv(hex(substring(...))) > ...) chain: '1' iff unsigned
  // byte i+1 > byte i with both in range — parity spec-pinned in
  // PhashScanSpec); the chain paid a binary slice + hex render +
  // base-16 reparse PER BIT and a ~432-node tree per consumer plan
  def phashBits(payload: Column): Column =
    graft.functions.PhashScan.phashBits(payload, 72)

  def phashDedup(
      media: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 4): DataFrame = {
    // pigeonhole needs MORE bands than flipped bits; pick the smallest
    // divisor of 72 strictly above the threshold so bands stay equal
    val nBands = Seq(2, 3, 4, 6, 8, 9, 12, 18, 24, 36, 72)
      .find(_ > maxHamming).getOrElse(
        throw new IllegalArgumentException(
          s"maxHamming $maxHamming leaves no exact-recall banding of a " +
            "72-bit hash (needs a divisor-of-72 band count above it, max 72)"))
    val width = 72 / nBands
    // materialize (id, phash) ONCE: the 72-term hash expression is a
    // heavy codegen unit, and without the cut every consumer stage
    // (grouping, banding, the final join-back) re-compiles and
    // re-evaluates it against the raw payload bytes
    val hashed = media.select(col(idCol).as("media_id"),
      phashBits(col(payloadCol)).as("phash")).localCheckpoint()
    // collapse EXACT-hash groups before banding: identical re-encodes —
    // the dominant duplicate class — are one hash aggregation, and only
    // one REPRESENTATIVE per distinct hash (its min id) enters the band
    // join, so a 10k-copy image can never make a band bucket quadratic.
    // Recall is unchanged: exact-group members share every band anyway.
    val groups = hashed.groupBy(col("phash"))
      .agg(min(col("media_id")).as("rep"))
    val bands = groups.select(col("rep"), col("phash"),
        explode(array((0 until nBands).map(k =>
          struct(lit(k).as("band_idx"),
            substring(col("phash"), 1 + width * k, width).as("band_val"))): _*)).as("b"))
      .select(col("rep"), col("phash"),
        col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
    // native hamming over the 72-char bit strings (== the former
    // 72-term substring-inequality sum, 144 slices per candidate
    // pair — parity spec-pinned in PhashScanSpec)
    def hamming(a: Column, b: Column): Column =
      graft.functions.PhashScan.charDiffCount(a, b, 72)
    val pairs = bands.toDF("a_rep", "a_phash", "band_idx", "band_val")
      .join(bands.toDF("b_rep", "b_phash", "band_idx", "band_val"),
        Seq("band_idx", "band_val"))
      .filter(col("a_rep") < col("b_rep"))
      .select("a_rep", "a_phash", "b_rep", "b_phash").distinct()
      .filter(hamming(col("a_phash"), col("b_phash")) <= maxHamming)
    // close duplicate groups TRANSITIVELY — a keeper_id must never
    // itself be a dup. Near-dup groups are almost always CLIQUES
    // (re-encodes of one picture all pair with each other), where ONE
    // hop of min-label already is the fixpoint, and occasionally SHORT
    // CHAINS (an edit ladder), where a couple more hops close them.
    // So: hop min-label with a converged-probe between hops (each hop
    // is one join+agg; each probe one bounded rep-level job), and pay
    // the full iterative connected-components machinery — per-round
    // lineage checkpoints, change counts — only if a component's
    // diameter outlives the hop budget (adversarially long ladders).
    val partners = pairs.select(col("a_rep").as("rep"), col("b_rep").as("partner"))
      .unionByName(pairs.select(col("b_rep").as("rep"), col("a_rep").as("partner")))
      .localCheckpoint() // the pair pipeline (band join + hamming) runs once
    // fixpoint test: min-label has converged exactly when every edge's
    // endpoints agree on a keeper; any disagreeing edge needs a hop
    def disagree(lbl: DataFrame): Boolean = partners
      .join(lbl, "rep")
      .join(lbl.toDF("partner", "pkeeper"), "partner")
      .filter(col("keeper") =!= col("pkeeper"))
      .limit(1).collect().nonEmpty
    def hop(lbl: DataFrame): DataFrame = {
      val nbrMin = partners
        .join(lbl.toDF("partner", "pkeeper"), "partner")
        .groupBy(col("rep")).agg(min(col("pkeeper")).as("nmin"))
      lbl.join(nbrMin, Seq("rep"), "left_outer")
        .select(col("rep"),
          least(col("keeper"), coalesce(col("nmin"), col("keeper"))).as("keeper"))
    }
    // hop OUTPUTS cut their lineage (each is referenced twice by the
    // next probe and twice by the next hop — uncheckpointed, hop k's
    // plan would re-run the label aggregation 2^k times, a real cost
    // once reps number in the millions); the INITIAL label frame stays
    // lazy — it is one tiny aggregation over the checkpointed partners,
    // and the common clique case ends after a single probe of it
    var lbl = partners.groupBy(col("rep"))
      .agg(least(min(col("partner")), col("rep")).as("keeper"))
    var hopsLeft = 3 // past this diameter the checkpointed CC loop wins
    var converged = !disagree(lbl)
    while (!converged && hopsLeft > 0) {
      lbl = hop(lbl).localCheckpoint()
      hopsLeft -= 1
      converged = !disagree(lbl)
    }
    val repKeeper =
      if (converged) lbl
      else graft.dedup.Dedup.connectedComponents(
          // the checkpointed partner frame, so the band+hamming pipeline
          // never re-executes; both directions present is harmless (CC
          // symmetrizes anyway)
          partners.select(col("rep").as("doc_a"), col("partner").as("doc_b")))
        .select(col("doc_id").as("rep"), col("cluster_id").as("keeper"))
    val keepers = groups.join(repKeeper, Seq("rep"), "left_outer")
      .select(col("phash"), coalesce(col("keeper"), col("rep")).as("keeper_id"))
    hashed.join(keepers, "phash")
      .select(col("media_id"), col("phash"), col("keeper_id"),
        (col("keeper_id") =!= col("media_id")).as("is_dup"))
  }

  def parseImageHeader(bytes: Array[Byte]): (String, Option[Int], Option[Int]) = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i).toLong << 24 | u8(i + 1) << 16 | u8(i + 2) << 8 | u8(i + 3)).toInt
    if (bytes.length >= 8 && PngMagic.indices.forall(i => u8(i) == PngMagic(i))) {
      // IHDR data starts at 16 (8 magic + 4 length + 4 "IHDR")
      if (bytes.length >= 24 &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
        ("png", Some(be32(16)), Some(be32(20)))
      else ("png", None, None)
    } else if (bytes.length >= 2 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i < bytes.length && u8(i) == 0xff) {
        // spec-legal 0xFF fill bytes may pad the gap before the marker id
        var m = i + 1
        while (m < bytes.length && u8(m) == 0xff) m += 1
        if (m >= bytes.length) return ("jpeg", None, None)
        val marker = u8(m)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOF payload after its 2-byte length: precision(1), height(2), width(2)
          return if (m + 8 <= bytes.length) ("jpeg", Some(be16(m + 6)), Some(be16(m + 4)))
          else ("jpeg", None, None)
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
          i = m + 1 // TEM/RSTn/SOI/EOI are standalone: no length field follows
        } else {
          if (m + 3 > bytes.length) return ("jpeg", None, None)
          val len = be16(m + 1)
          if (len < 2) return ("jpeg", None, None) // corrupt: length includes itself
          i = m + 1 + len
        }
      }
      ("jpeg", None, None)
    } else ("unknown", None, None)
  }

  /** `mm_image_header`: header decode over the binary payload column —
    * a REAL parser per row: [[parseImageHeader]] reads actual PNG/JPEG
    * structure out of the bytes. A plain narrow map (no batching: the
    * parser is pure byte math with no per-call setup to amortize, unlike
    * [[decodeFeatures]]'s kernel); payloads never shuffle.
    */
  def imageHeaders(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, w, h) = parseImageHeader(bytes)
        ImageHeader(id, fmt, bytes.length, w, h)
      })
      .toDF()
  }

  /** A parsed WAV header: fmt-chunk audio parameters plus the frame
    * count declared by the data chunk (None fields when the payload is
    * not RIFF/WAVE or is truncated before the relevant chunk).
    */
  final case class AudioMeta(
      media_id: Long, format: String, n_bytes: Int,
      channels: Option[Int], sample_rate: Option[Int],
      bits_per_sample: Option[Int], n_frames: Option[Long])

  /** REAL WAV (RIFF) header decode — little-endian byte math, the
    * counterpart of [[parseImageHeader]]'s big-endian formats:
    *
    *  - "RIFF" magic, u32le riff size, "WAVE" form type;
    *  - chunks walked by their OWN u32le size fields (odd sizes padded
    *    to even per RIFF), so LIST/INFO or other metadata chunks before
    *    "fmt " are skipped correctly;
    *  - "fmt ": channels u16le @+2, sample rate u32le @+4,
    *    bits/sample u16le @+14;
    *  - "data": its declared size gives the frame count
    *    (size / block align) WITHOUT the sample bytes needing to be
    *    present — header-only payloads (the first KB of a ranged read,
    *    the production pattern for scraping audio metadata at 100 TB)
    *    parse fine.
    *
    * Non-RIFF payloads → format "unknown"; truncation → detected format
    * with None fields, never an exception.
    */
  def parseWavHeader(bytes: Array[Byte]): (String, Option[Int], Option[Int], Option[Int], Option[Long]) = {
    def u8(i: Int) = bytes(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int) = new String(bytes.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    val none = (None, None, None, None)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return ("unknown", None, None, None, None)
    // the cursor stays in Long arithmetic: a chunk size is u32 and a
    // corrupt value >= 2^31 truncated through Int would stall or drive
    // the cursor negative — on corrupt bytes the walk must TERMINATE
    // (yielding None fields), never loop or throw
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, block, bits
    var frames: Option[Long] = None
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val at = i.toInt // i + 8 <= length, so the window indexes fit in Int
      val id = tag(at)
      val size = le32(at + 4)
      if (id == "fmt " && i + 8 + 16 <= bytes.length)
        fmt = Some((le16(at + 10), le32(at + 12).toInt, le16(at + 20), le16(at + 22)))
      if (id == "data") {
        // declared size is authoritative; the sample bytes need not follow
        frames = fmt.collect { case (_, _, block, _) if block > 0 => size / block }
        done = true
      } else {
        val next = i + 8 + size + (size & 1) // RIFF pads odd chunks to even
        if (next <= i) done = true else i = next
      }
    }
    fmt match {
      case Some((ch, rate, _, bits)) => ("wav", Some(ch), Some(rate), Some(bits), frames)
      case None                      => ("wav", None, None, None, None)
    }
  }

  /** `mm_audio_meta`: WAV header decode over the payload column — same
    * narrow-map shape as [[imageHeaders]].
    */
  def audioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, ch, rate, bits, frames) = parseWavHeader(bytes)
        AudioMeta(id, fmt, bytes.length, ch, rate, bits, frames)
      })
      .toDF()
  }

  /** A parsed MP4/ISO-BMFF header: major brand from `ftyp`, movie
    * timescale/duration from `moov`→`mvhd` (None when absent or
    * truncated).
    */
  final case class VideoMeta(
      media_id: Long, format: String, n_bytes: Int,
      brand: Option[String], timescale: Option[Int], duration_ms: Option[Long])

  /** REAL MP4 (ISO base media file format) header decode — big-endian
    * box walk, completing the image (BE chunk) / audio (LE chunk) /
    * video triad:
    *
    *  - top-level boxes are `size(u32 BE) + type(4 ASCII)`; the first
    *    must be `ftyp`, whose payload starts with the major brand;
    *  - the walk follows box sizes to `moov` (a pure container), then
    *    walks moov's CHILDREN to `mvhd`, whose version-0 payload holds
    *    timescale (u32 BE @+12) and duration (u32 BE @+16);
    *    duration_ms = duration * 1000 / timescale;
    *  - box size 0 means "to end of file" (spec) — treated as
    *    terminal; anything non-ftyp-leading is "unknown"; truncation
    *    yields the detected format with None fields, never a throw.
    */
  def parseMp4Header(bytes: Array[Byte]): (String, Option[String], Option[Int], Option[Long]) = {
    def u8(i: Int) = bytes(i) & 0xff
    def be32(i: Int) = u8(i).toLong << 24 | u8(i + 1) << 16 | u8(i + 2) << 8 | u8(i + 3)
    def tag(i: Int) = new String(bytes.slice(i, i + 4), java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 8 || tag(4) != "ftyp")
      return ("unknown", None, None, None)
    val brand = if (bytes.length >= 12) Some(tag(8)) else None
    // cursors stay in Long arithmetic: box sizes are u32, and a corrupt
    // size in (2^31, 2^32) truncated through Int would move the cursor
    // BACKWARD into a negative index — any size that is not the
    // documented 0 terminal and does not strictly advance past the
    // current box header (i.e. < 8) is treated as terminal truncation
    var i = 0L
    var mvhd: Option[(Int, Long)] = None
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val at = i.toInt // loop guard keeps the header window in Int range
      val size = be32(at)
      val box = tag(at + 4)
      if (box == "moov") {
        // walk the container's children for mvhd; size 0 = to end of file
        var j = i + 8
        val end = if (size == 0L) bytes.length.toLong
                  else math.min(i + size, bytes.length.toLong)
        while (mvhd.isEmpty && j + 8 <= end) {
          val cat = j.toInt
          val csize = be32(cat)
          if (tag(cat + 4) == "mvhd" && j + 8 + 20 <= bytes.length && u8(cat + 8) == 0) {
            val ts = be32(cat + 20).toInt
            val dur = be32(cat + 24)
            if (ts > 0) mvhd = Some((ts, dur * 1000L / ts))
          }
          if (csize < 8) j = end else j += csize
        }
        done = true
      } else if (size < 8) done = true // 0 = to-EOF terminal; 1-7 corrupt
      else i += size
    }
    ("mp4", brand, mvhd.map(_._1), mvhd.map(_._2))
  }

  /** `mm_video_meta`: MP4 header decode — same narrow-map shape as
    * [[imageHeaders]]/[[audioMeta]].
    */
  def videoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, brand, ts, dur) = parseMp4Header(bytes)
        VideoMeta(id, fmt, bytes.length, brand, ts, dur)
      })
      .toDF()
  }

  /** `mm_resize_meta`: metadata-only resize planning — compute target
    * dimensions that fit a bound while preserving aspect ratio. Touches
    * only the metadata struct: the binary column is pruned at scan.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame =
    media.select(
      col("media_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      // clamp the long side to the bound (never upscale), scale the short
      // side by the same ratio: aspect preserved in both orientations
      when(col("meta.width") >= col("meta.height"),
        least(col("meta.width"), lit(maxSide)))
        .otherwise(floor(col("meta.width") * least(col("meta.height"), lit(maxSide)) /
          greatest(col("meta.height"), lit(1))))
        .cast("int").as("target_w"),
      when(col("meta.height") > col("meta.width"),
        least(col("meta.height"), lit(maxSide)))
        .otherwise(floor(col("meta.height") * least(col("meta.width"), lit(maxSide)) /
          greatest(col("meta.width"), lit(1))))
        .cast("int").as("target_h"))

  /** `mm_frame_sample`: uniform frame sampling for "video" rows —
    * metadata-only, emits (media_id, frame_idx) via a generator, payload
    * untouched. `stride` frames apart, at most `maxFrames` per video.
    */
  def frameSample(media: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    media.select(
      col("media_id"),
      explode(
        when(col("meta.n_frames") > 0,
          slice(sequence(lit(0), col("meta.n_frames") - 1, lit(stride)), 1, maxFrames))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
}
