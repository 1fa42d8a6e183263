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

  test("real codec round-trip: decoded dims match generation, PNG pixels exact") {
    val feats = Multimodal.decodeImages(spark, sf).collect()
    assert(feats.length == Tables.documents(spark, sf).count())
    feats.foreach { f =>
      // dims survive BOTH codecs (the real decoder parsed real bytes)
      assert(f.width == (8 + (f.media_id * 7) % 40).toInt, s"id ${f.media_id}")
      assert(f.height == (8 + (f.media_id * 13) % 40).toInt)
      if (f.media_type == "image/png") {
        // PNG is lossless: decoded pixel sum == generating formula
        var want = 0L
        for (y <- 0 until f.height; x <- 0 until f.width)
          want += (f.media_id * 31 + x * 17 + y * 29) % 256
        assert(f.pix_sum.contains(want), s"id ${f.media_id}")
      } else assert(f.pix_sum.isEmpty)
    }
    // both codecs actually present
    assert(feats.exists(_.media_type == "image/png"))
    assert(feats.exists(_.media_type == "image/jpeg"))
  }

  test("image payloads are genuine containers (magic bytes)") {
    val recs = Multimodal.imageTable(spark, sf).collect()
    recs.foreach { r =>
      if (r.media_type == "image/png")
        assert(r.payload.take(8).sameElements(
          Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))
      else // JPEG SOI marker
        assert((r.payload(0) & 0xff) == 0xff && (r.payload(1) & 0xff) == 0xd8)
    }
  }

  test("real resize: target dims, deterministic") {
    val a = Multimodal.resizeImages(spark, sf, 32, 32).collect().sortBy(_.media_id)
    val b = Multimodal.resizeImages(spark, sf, 32, 32).collect().sortBy(_.media_id)
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { f => assert(f.width == 32 && f.height == 32 && f.pix_sum.nonEmpty) }
  }

  test("perceptual dedup: every one-pixel variant pairs with its base") {
    val pairs = Multimodal.phashDedup(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, ham) =>
      assert(a < b && ham >= 0 && ham <= 3)
    }
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    val variantBases = Tables.documents(spark, sf)
      .select(col("doc_id")).as[Long].collect().filter(_ % 10 == 0)
    assert(variantBases.nonEmpty)
    // a one-pixel flip moves one cell's mean a hair: the average hash
    // must keep the pair within the banding's Hamming<=3 guarantee
    variantBases.foreach { id =>
      assert(pairSet.contains((id, id + 1000000L)),
        s"variant pair ($id, ${id + 1000000L}) missed")
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

  test("audio payloads are genuine RIFF/WAVE containers") {
    val rec = Multimodal.audioTable(spark, sf).head()
    val p = rec.payload
    assert(new String(p.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(p.slice(8, 12), "US-ASCII") == "WAVE")
    // canonical header + 2 bytes per 16-bit mono sample
    val n = 400 + (rec.media_id % 5) * 100
    assert(p.length == 44 + 2 * n, s"container ${p.length} bytes for $n samples")
  }

  test("real WAV round-trip: decoded features equal the PCM formula") {
    val rows = Multimodal.decodeAudio(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.take(20).foreach { r =>
      val n = (400 + (r.media_id % 5) * 100).toInt
      var sumSq = 0L; var peak = 0L; var silent = 0L
      (0 until n).foreach { j =>
        val s = ((r.media_id * 7919L + j * 104729L + 12345L) % 65536L) - 32768L
        sumSq += s * s
        val a = math.abs(s)
        if (a > peak) peak = a
        if (a < 1000L) silent += 1
      }
      assert(r.n_samples == n && r.sum_sq == sumSq && r.peak == peak &&
        r.n_silent == silent && r.n_frames == (n + 99) / 100,
        s"clip ${r.media_id}: decoded features diverge from formula")
    }
  }
}
