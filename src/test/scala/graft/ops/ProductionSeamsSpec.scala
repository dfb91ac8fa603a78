package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The two "swap in a production model" seams exercised with REAL
  * (non-stub) inputs end-to-end:
  *
  *   1. [[QualityModel.score]] consuming a trained-style fastText
  *      vocabulary (feature strings + float weights, the public .vec
  *      shape) through the [[QualityModel.weightTable]] loading seam —
  *      not the md5 [[QualityModel.hashWeights]] stand-in.
  *   2. [[Multimodal]] decode → features → resize over a batch of real
  *      image/audio bytes produced by actual encoders (javax.imageio
  *      PNG/JPEG writers, javax.sound WAV writer) — not hand-planted
  *      header bytes.
  */
class ProductionSeamsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------
  // Seam 1: trained weight table -> score
  // ------------------------------------------------------------------

  private val NumBuckets = 1 << 18

  // A tiny fastText-style quality vocabulary: positive weights on
  // function words that mark running prose, negative on spam cues, one
  // bigram feature — feature STRINGS with float weights, exactly the
  // shape a trained model file provides.
  private val vocab = Seq(
    ("the", 0.8), ("of", 0.6), ("and", 0.5), ("is", 0.4),
    ("cat sat", 1.2),
    ("casino", -2.5), ("click", -1.8), ("free", -1.2), ("winner", -1.5))

  test("trained fastText-style vocabulary flows through weightTable into score") {
    val weights = QualityModel.weightTable(
      vocab.toDF("feature", "weight"), "feature", "weight", NumBuckets)
    // sparse: one row per (non-colliding) trained feature, not 2^18
    assert(weights.count() == vocab.size)

    // exactness pin on the seam: a one-feature document's logit IS the
    // trained weight (1e6-scaled long, no drift anywhere in the path)
    val one = QualityModel.score(
      Seq((1L, "the")).toDF("doc_id", "text"), "doc_id", "text",
      weights, NumBuckets)
      .collect().head
    assert(one.getAs[Long]("n_feats") == 1L)
    assert(one.getAs[Long]("logit_scaled") == 800000L)

    // semantics: prose scores positive, spam negative, under the SAME
    // table score() broadcasts
    val docs = Seq(
      (10L, "the cat sat and the dog is one of many"),
      (20L, "click free casino winner click free winner")).toDF("doc_id", "text")
    val byId = QualityModel.score(docs, "doc_id", "text", weights, NumBuckets)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("logit")).toMap
    assert(byId(10L) > 0.0 && byId(20L) < 0.0,
      s"prose ${byId(10L)} should be > 0 > spam ${byId(20L)}")

    // e2e over the real corpus: the same trained table scores every
    // document with a defined feature set
    val corpus = QualityModel.score(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text",
      weights, NumBuckets)
    assert(corpus.filter(col("n_feats") > 0 && col("logit").isNotNull)
      .count() > 0)
    assert(corpus.filter(col("logit").isNotNull && isnan(col("logit")))
      .count() == 0)
  }

  // ------------------------------------------------------------------
  // Seam 2: real image/audio bytes -> decode -> features -> resize
  // ------------------------------------------------------------------

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 13 + y * 17) & 0xFFFFFF)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def realWav(frames: Int, sampleRate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = Array.tabulate[Byte](frames * 2)(i => ((i % 251) - 125).toByte)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real encoder output drives decode -> featureExtract -> resizeFit") {
    val batch = Seq(
      (1L, realPng(33, 21)),
      (2L, realJpeg(64, 48)),
      (3L, realWav(3200, 16000f)),
      (4L, Array[Byte](1, 2, 3, 4, 5))) // corrupt payload stays a row
      .toDF("asset_id", "payload")

    // decode: the header parser reads what the REAL encoders wrote
    val decoded = Multimodal.decode(batch, "payload")
      .select(col("asset_id"), col("asset.format").as("fmt"),
        col("asset.width").as("w"), col("asset.height").as("h"),
        col("asset.channels").as("ch"),
        col("asset.sample_rate").as("sr"),
        col("asset.duration_ms").as("dur"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(decoded(1L).getAs[String]("fmt") == "png" &&
      decoded(1L).getAs[Int]("w") == 33 && decoded(1L).getAs[Int]("h") == 21)
    assert(decoded(2L).getAs[String]("fmt") == "jpeg" &&
      decoded(2L).getAs[Int]("w") == 64 && decoded(2L).getAs[Int]("h") == 48)
    assert(decoded(3L).getAs[String]("fmt") == "wav" &&
      decoded(3L).getAs[Int]("ch") == 1 &&
      decoded(3L).getAs[Int]("sr") == 16000 &&
      decoded(3L).getAs[Long]("dur") == 200L) // 3200 frames / 16 kHz
    assert(decoded(4L).getAs[String]("fmt") == "unknown")

    // featureExtract: fixed-width vectors over every real payload,
    // deterministic across runs (the encoder-stage contract)
    val dim = 8
    def feats() = Multimodal.featureExtract(batch, "payload", dim)
      .select(col("asset_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val f1 = feats()
    assert(f1.values.forall(v => v.length == dim && v.forall(d => !d.isNaN)))
    assert(f1 == feats())

    // resizeFit: aspect-preserving box fit on the real images; audio
    // and corrupt rows pass through with null resize fields
    val resized = Multimodal.resizeFit(batch, "payload", 16, 16)
      .select(col("asset_id"), col("resized_width"), col("resized_height"),
        col("resized_payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(resized(1L).getAs[Int]("resized_width") == 16 &&
      resized(1L).getAs[Int]("resized_height") == 10) // 33x21 -> 16x10
    assert(resized(2L).getAs[Int]("resized_width") == 16 &&
      resized(2L).getAs[Int]("resized_height") == 12) // 64x48 -> 16x12
    assert(resized(3L).isNullAt(1) && resized(4L).isNullAt(1))
    // the resized payload is itself a decodable image with those dims
    val rt = Multimodal.decode(
      Seq((1L, resized(1L).getAs[Array[Byte]]("resized_payload")))
        .toDF("id", "p"), "p")
      .select(col("asset.width"), col("asset.height")).collect().head
    assert(rt.getInt(0) == 16 && rt.getInt(1) == 10)
  }

  test("resizeFit performs a REAL pixel resample, not a header rewrite") {
    // solid-red source: any genuine pixel resample preserves the color;
    // a header-only rewrite cannot (the payload would carry no raster)
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 30) img.setRGB(x, y, 0xFF0000)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val out = Multimodal.resizeFit(
      Seq((1L, bos.toByteArray)).toDF("id", "payload"), "payload", 16, 16)
      .select(col("resized_width"), col("resized_height"),
        col("resized_payload")).collect().head
    assert(out.getInt(0) == 16 && out.getInt(1) == 12) // 40x30 into 16x16
    val dec = javax.imageio.ImageIO.read(
      new ByteArrayInputStream(out.getAs[Array[Byte]](2)))
    assert(dec != null && dec.getWidth == 16 && dec.getHeight == 12)
    assert((dec.getRGB(8, 6) & 0xFFFFFF) == 0xFF0000) // pixels survived

    // header-only fixtures (no raster) degrade to the documented
    // header fallback: round-trip dims still hold
    val hdr = Multimodal.resizeFit(
      Seq(2).toDF("id").select(col("id"),
        Multimodal.synthJpeg(lit(640), lit(320)).as("payload")),
      "payload", 320, 200)
      .select(col("resized_payload")).collect().head.getAs[Array[Byte]](0)
    val rt2 = Multimodal.decodeHeader(hdr)
    assert(rt2.getString(1) == "jpeg" &&
      rt2.getInt(2) == 320 && rt2.getInt(3) == 160)

    // synthRaster produces ImageIO-decodable payloads in both formats
    Seq("png", "jpeg").foreach { f =>
      val r = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(Multimodal.synthRaster(f, 20, 10, 7L)))
      assert(r != null && r.getWidth == 20 && r.getHeight == 10, f)
    }
  }
}
