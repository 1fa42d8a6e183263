package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: payload bytes round-trip and n_bytes is real") {
    val rows = Multimodal.mediaTable(spark, sf)
      .select(col("media_id"), col("payload"), col("n_bytes"))
      .as[(Long, Array[Byte], Long)].collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { case (_, payload, n) => assert(payload.length.toLong == n) }
  }

  test("decode pipeline is deterministic and total") {
    val a = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(spark, sf).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { f =>
      assert(f.width >= 64 && f.width < 576)
      assert(f.height >= 64 && f.height < 576)
    }
  }

  test("resize stage: all features at target dims, checksums chained") {
    val rs = Multimodal.resized(spark, sf, 224, 224).collect()
    assert(rs.nonEmpty)
    rs.foreach { f => assert(f.width == 224 && f.height == 224) }
    val orig = Multimodal.decodeFeatures(spark, sf).collect()
      .map(f => f.media_id -> f).toMap
    rs.foreach { f =>
      val o = orig(f.media_id)
      assert(f.checksum == o.checksum * 31 + 224 * 65521 + 224)
    }
  }

  test("frame sampling: offsets on stride, full frames only") {
    val frames = Multimodal.sampleFrames(spark, sf).collect()
    assert(frames.nonEmpty)
    frames.foreach { fr =>
      assert(fr.frame_no % 4 == 0)
      assert(fr.offset == fr.frame_no.toLong * 32)
      assert(fr.n_bytes == 32)
    }
    val perDoc = frames.groupBy(_.media_id).view.mapValues(_.length)
    val nbytes = Multimodal.mediaTable(spark, sf)
      .select("media_id", "n_bytes")
      .as[(Long, Long)].collect().toMap
    perDoc.foreach { case (id, n) =>
      assert(n == math.ceil((nbytes(id) / 32) / 4.0).toInt)
    }
  }

  test("byte-budget partitioning bounds per-partition payload bytes") {
    val budget = 20000L
    val parted = Multimodal.partitionByByteBudget(
      Multimodal.mediaTable(spark, sf), budget)
    assert(parted.rdd.getNumPartitions > 1)
    assert(parted.count() == Tables.documents(spark, sf).count())
    // the bucketing invariant: every cumsum bucket carries at most
    // budget + one record's bytes (the record that crosses the edge)
    val maxRec = Multimodal.mediaTable(spark, sf)
      .agg(max("n_bytes")).as[Long].collect().head
    val bucketBytes = Multimodal.mediaTable(spark, sf)
      .orderBy("media_id")
      .select(col("media_id"), col("n_bytes"))
      .as[(Long, Long)].collect()
      .scanLeft(0L)(_ + _._2).tail
      .map(cum => (cum - 1) / budget)
      .zip(Multimodal.mediaTable(spark, sf).orderBy("media_id")
        .select("n_bytes").as[Long].collect())
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    bucketBytes.foreach { case (bk, b) =>
      assert(b <= budget + maxRec, s"bucket $bk carries $b bytes")
    }
  }

  test("fake decoder matches the column pipeline (seam check)") {
    val viaPipeline = Multimodal.decodeFeatures(spark, sf)
      .filter(_.media_id == 0L).collect().head
    val payload = Multimodal.mediaTable(spark, sf)
      .filter(col("media_id") === 0L)
      .select(col("payload")).as[Array[Byte]].collect().head
    val (w, h, sum) = Multimodal.fakeDecode(payload)
    assert(viaPipeline.width == w && viaPipeline.height == h &&
      viaPipeline.checksum == sum)
  }
}
