package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-parity contract of the native phash bit assembler and hamming
  * counter against the 72-term expression chains they replaced in
  * Multimodal.phashDedup — over adversarial inputs: payloads shorter
  * than 73 bytes (out-of-range substring -> conv null -> '0' branch),
  * exactly 73, longer, all-equal bytes, 0x00/0xff unsigned edges, and
  * bit strings of unequal lengths for the hamming side.
  * mm_image_dedup_phash is oracle-verified through these values, so
  * parity here IS oracle parity.
  */
class PhashScanSpec extends SparkSpec {
  import spark.implicits._

  /** The former shape, verbatim. */
  private def hofBits(payload: Column): Column = {
    def byteAt(i: Int): Column =
      conv(hex(substring(payload, i, 1)), 16, 10).cast("int")
    concat((1 to 72).map(i =>
      when(byteAt(i + 1) > byteAt(i), lit("1")).otherwise(lit("0"))): _*)
  }

  private def hofHamming(a: Column, b: Column): Column =
    (1 to 72).map(i =>
      when(substring(a, i, 1) =!= substring(b, i, 1), 1).otherwise(0))
      .reduce(_ + _)

  test("phashBits == 72-term conv/hex/substring chain") {
    val payloads = Seq(
      Array.tabulate(100)(i => ((i * 37 + 11) % 256).toByte), // long
      Array.tabulate(73)(i => ((255 - i * 3) % 256).toByte), // exact
      Array.tabulate(16)(i => (i * 17).toByte), // md5-sized (short)
      Array.fill(80)(0x42.toByte), // all equal -> all '0'
      Array[Byte](0x00, 0xff.toByte, 0x00, 0x7f, 0x80.toByte), // unsigned edges
      Array.empty[Byte]
    ).zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val rows = payloads.toDF("id", "payload")
      .select(col("id"),
        PhashScan.phashBits(col("payload"), 72).as("native"),
        hofBits(col("payload")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"payload ${r.getLong(0)}: ${r.getString(1)} != ${r.getString(2)}")
      assert(r.getString(1).length == 72)
    }
  }

  test("charDiffCount == 72-term substring-inequality sum") {
    val bits = Seq(
      ("0" * 72, "0" * 72),
      ("1" * 72, "0" * 72),
      ("01" * 36, "10" * 36),
      ("0" * 72, "0" * 35 + "1" + "0" * 36),
      ("0" * 40, "0" * 72), // unequal lengths: missing-vs-present differ
      ("0" * 40, "0" * 40), // both exhausted past 40: equal
      ("", "1" * 5)
    ).zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
    val rows = bits.toDF("id", "a", "b")
      .select(col("id"),
        PhashScan.charDiffCount(col("a"), col("b"), 72).as("native"),
        hofHamming(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"pair ${r.getLong(0)}: native ${r.getInt(1)} != hof ${r.getInt(2)}")
    }
  }

  test("phashDedup end to end unchanged on a planted fixture") {
    // 0 singleton, 1~2 near (2 bytes flipped), 3=1 exact twin
    val base = Array.tabulate(80)(i => ((i * 53 + 7) % 256).toByte)
    val near = base.clone(); near(3) = (near(3) ^ 0x40).toByte
    val rows = Seq(
      (0L, Array.tabulate(80)(i => ((i * 91 + 3) % 256).toByte)),
      (1L, base), (2L, near), (3L, base.clone()))
      .toDF("media_id", "payload")
    val out = graft.multimodal.Multimodal
      .phashDedup(rows, "media_id", "payload", maxHamming = 4)
      .select("media_id", "keeper_id", "is_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, false), (1L, 1L, false),
      (2L, 1L, true), (3L, 1L, true)))
  }
}
