package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing: binary schema, native synthetic decode, frame
  * sampling, resize — the batch shapes a real codec would plug into. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode (native graft_byte_hist): normalized byte histogram") {
    // "aab" → bytes 97,97,98 → buckets 97%16=1 (×2), 98%16=2 (×1)
    val feats = Seq("aab").toDF("t")
      .select(Multimodal.decode(spark, encode($"t", "UTF-8")).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(feats.length == Multimodal.HIST_BUCKETS)
    assert(approxEqual(feats(1), 2.0 / 3))
    assert(approxEqual(feats(2), 1.0 / 3))
    assert(approxEqual(feats.sum, 1.0))
  }

  test("frameSample: fixed-size frames, short tail") {
    val frames = Seq("abcdefgh").toDF("t")
      .select(Multimodal.frameSample(encode($"t", "UTF-8"), 3).as("f"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(frames.map(new String(_, "UTF-8")) == Seq("abc", "def", "gh"))
  }

  test("resizeStub: truncate and zero-pad to target") {
    val out = Seq(("abcdef", "ab")).toDF("long", "short")
      .select(
        Multimodal.resizeStub(encode($"long", "UTF-8"), 4).as("cut"),
        Multimodal.resizeStub(encode($"short", "UTF-8"), 4).as("pad"))
      .collect()(0)
    assert(new String(out.getAs[Array[Byte]](0), "UTF-8") == "abcd")
    assert(out.getAs[Array[Byte]](1).toSeq ==
      Seq('a'.toByte, 'b'.toByte, 0.toByte, 0.toByte))
  }

  test("decodeBatchedPartitions equals the native column path exactly") {
    val docs = Seq.tabulate(10)(i => (i.toLong, s"payload-$i" * (i + 1)))
      .toDF("asset_id", "t")
      .select($"asset_id", encode($"t", "UTF-8").as("payload"))
    val viaBatch = Multimodal.decodeBatchedPartitions(docs, batchSize = 3)
      .orderBy($"asset_id").collect()
    val viaExpr = docs
      .select($"asset_id", Multimodal.decode(spark, $"payload").as("features"))
      .orderBy($"asset_id").collect()
    assert(viaBatch.length == 10)
    // both paths run the SAME kernel (ByteHistExpr.histogram), so the
    // agreement contract is bit-equality, not approximate
    viaBatch.zip(viaExpr).foreach { case (b, u) =>
      assert(b.getLong(0) == u.getLong(0))
      val bf = b.getSeq[Double](1); val uf = u.getSeq[Double](1)
      bf.zip(uf).foreach { case (x, y) => assert(x == y) }
    }
  }

  test("asset table schema: payload binary + metadata struct") {
    val docs = Seq((1L, "hello world", "en", "srcX", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val assets = Multimodal.assetsFromDocuments(docs)
    val r = assets.select($"modality", $"meta.n_bytes", $"meta.sample_rate")
      .collect()(0)
    assert(r.getString(0) == "audio") // odd id
    assert(r.getInt(1) == 11)
    assert(r.getInt(2) == 16000)
    assert(assets.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
  }
}
