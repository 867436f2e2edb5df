package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Multimodal

/** Multimodal payload plumbing: the resize compaction step's integer
  * geometry, proportional byte slice, and no-upscale law.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("resizeToFit: integer geometry, proportional slice, no upscale") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val media = Seq(
      // landscape 512x240 -> fits to 128x60
      (1L, "image", Array.fill[Byte](1000)(7), 512L, 240L),
      // already within bounds -> untouched geometry and payload
      (2L, "image", Array.fill[Byte](300)(7), 100L, 80L),
      // portrait 64x480 -> 17x128
      (3L, "video", Array.fill[Byte](960)(7), 64L, 480L))
      .toDF("media_id", "kind", "payload", "w", "h")
    val out = Multimodal.resizeToFit(media, maxDim = 128)
      .collect().sortBy(_.media_id)
    assert(out.map(r => (r.media_id, r.out_w, r.out_h)).toSeq ==
      Seq((1L, 128L, 60L), (2L, 100L, 80L), (3L, 17L, 128L)))
    // byte budget scales with the area ratio (integer math)
    assert(out(0).n_bytes_out == 1000L * (128 * 60) / (512 * 240))
    assert(out(1).n_bytes_out == 300L)
    // the stub actually compacts the payload to that budget
    out.foreach(r => assert(r.payload_out.length.toLong == r.n_bytes_out))
  }

  test("sampleFrames windows tile the payload: stride law, bounds, first-byte probe") {
    val s = spark; import s.implicits._
    // media_id 9 -> n_frames (9%8+2)*5 = 15, payload 47 bytes ->
    // frame_bytes 47 div 15 = 3; stride 7 samples frames 0, 7, 14
    val payload = (0 until 47).map(i => ('a' + i % 26).toByte).toArray
    val media = Seq((9L, "video", payload), (10L, "image", payload))
      .toDF("media_id", "kind", "payload")
    val rows = Multimodal.sampleFrames(media, stride = 7)
      .orderBy("frame_idx")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // non-video rows never sample
    assert(rows.forall(_._1 == 9L))
    assert(rows.map(_._2).toSeq == Seq(0L, 7L, 14L))
    for ((_, idx, off, n, first) <- rows) {
      assert(off == idx * 3 && n == 3, s"frame $idx window ($off, $n)")
      // every window starts strictly inside the payload
      assert(off < payload.length)
      assert(first == payload(off.toInt).toLong, s"frame $idx probe")
    }
  }
}
