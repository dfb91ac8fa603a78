package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns plus typed metadata, exactly as
  * they would in a 100 TB lakehouse (parquet binary + struct metadata).
  *
  * [[decodeHeader]] is a real, dependency-free container-header decoder:
  * JPEG (SOI + segment walk to the SOF frame header), PNG (IHDR), GIF
  * (logical screen descriptor) and WAV (RIFF fmt/data chunk walk). It
  * recovers width/height for images and channels/sample-rate/duration
  * for audio from the actual bytes — no image/audio libraries needed,
  * the formats' framing is enough. Full-frame pixel/PCM decode is out of
  * scope (and would be a codec library call inside the same
  * mapPartitions slot); header metadata is what a curation pipeline
  * filters on.
  *
  * The Spark-side machinery — schema, partition-preserving mapPartitions
  * transforms, batch shape — is the shape an Arrow/Pandas-UDF decode
  * stage has on a real cluster.
  */
object Multimodal {

  /** Metadata schema attached to every decoded asset. Image fields are
    * NULL for audio and vice versa; unparseable payloads decode as
    * format "unknown" with all fields NULL (never an exception — one
    * corrupt asset must not kill a 100 TB scan). */
  val assetSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap a text/bytes column as a binary payload column. */
  def asPayload(c: Column): Column = encode(c, "UTF-8")

  // ---------------------------------------------------------------- parse
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24))
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => u8(b, i + j) == s.charAt(j))

  private def unknown(n: Long): Row =
    Row(n, "unknown", null, null, null, null, null)
  private def image(n: Long, fmt: String, w: Int, h: Int): Row =
    Row(n, fmt, w, h, null, null, null)

  /** JPEG SOF markers carrying frame dimensions: C0-CF minus DHT (C4),
    * JPG (C8) and DAC (CC). */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Walk JPEG segments from SOI to the first SOF header.
    * Layout per segment: FF <marker> <len:be16 incl itself> <payload>;
    * SOF payload: precision(1) height(be16) width(be16). */
  private def parseJpeg(b: Array[Byte]): Row = {
    val n = b.length.toLong
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xFF) return unknown(n)     // lost segment sync
      val marker = u8(b, i + 1)
      if (marker == 0xFF) i += 1                  // fill byte padding
      else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0xD9) return unknown(n)  // EOI before any SOF
      else {
        if (i + 3 >= b.length) return unknown(n)
        val len = be16(b, i + 2)
        if (isSof(marker)) {
          if (i + 8 >= b.length || len < 7) return unknown(n)
          return image(n, "jpeg", be16(b, i + 7), be16(b, i + 5))
        }
        if (len < 2) return unknown(n)
        i += 2 + len
      }
    }
    unknown(n)
  }

  /** PNG: 8-byte magic, then the IHDR chunk (len be32 = 13, "IHDR",
    * width be32, height be32). */
  private def parsePng(b: Array[Byte]): Row = {
    val n = b.length.toLong
    if (b.length < 24 || !ascii(b, 12, "IHDR")) return unknown(n)
    image(n, "png", be32(b, 16), be32(b, 20))
  }

  /** GIF87a/89a: logical screen width/height, little-endian at 6/8. */
  private def parseGif(b: Array[Byte]): Row = {
    val n = b.length.toLong
    if (b.length < 10) return unknown(n)
    image(n, "gif", le16(b, 6), le16(b, 8))
  }

  /** WAV: RIFF/WAVE, then a chunk walk — "fmt " yields channels, sample
    * rate and byte rate; "data"'s declared size / byte-rate is the
    * duration. Chunks are word-aligned (odd sizes padded by one). */
  private def parseWav(b: Array[Byte]): Row = {
    val n = b.length.toLong
    var channels = -1; var sampleRate = -1; var byteRate = -1L; var dataSize = -1L
    var i = 12L
    while (i + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = le32(b, i.toInt + 4) // unsigned 32-bit, always >= 0
      if (ascii(b, i.toInt, "fmt ")) {
        if (i + 24 > b.length) return unknown(n)
        channels = le16(b, i.toInt + 10)
        sampleRate = le32(b, i.toInt + 12).toInt
        byteRate = le32(b, i.toInt + 16)
      } else if (ascii(b, i.toInt, "data")) {
        dataSize = size
      }
      // Long arithmetic: a corrupt 4 GiB chunk size must overshoot the
      // payload and end the walk, never truncate to a zero/negative step
      // (an infinite loop on one corrupt asset would wedge the scan).
      i += 8L + size + (size & 1L)
    }
    if (channels < 0 || dataSize < 0 || byteRate <= 0) return unknown(n)
    Row(n, "wav", null, null, channels, sampleRate, dataSize * 1000L / byteRate)
  }

  /** Decode one payload's container header. Never throws: anything that
    * fails framing checks is format "unknown". */
  def decodeHeader(payload: Array[Byte]): Row = {
    val b = payload
    try {
      if (b.length >= 24 && u8(b, 0) == 0x89 && ascii(b, 1, "PNG")) parsePng(b)
      else if (b.length >= 4 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8) parseJpeg(b)
      else if (ascii(b, 0, "GIF8")) parseGif(b)
      else if (b.length >= 44 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) parseWav(b)
      else unknown(b.length.toLong)
    } catch {
      case scala.util.control.NonFatal(_) => unknown(b.length.toLong)
    }
  }

  /** Decode payloads partition-by-partition. Runs as a narrow
    * `Dataset.mapPartitions` transform: no shuffle, batch-at-a-time,
    * preserving input partitioning — the shape a Pandas-UDF/Arrow decode
    * stage has on a real cluster. Staying a Dataset (vs dropping to
    * `df.rdd`) keeps the decode inside one query plan: Catalyst can
    * still prune/push around it and codegen the stages on either side,
    * instead of a plan-breaking RDD round-trip. */
  def decode(df: DataFrame, payloadCol: String): DataFrame =
    appendMapped(df, payloadCol,
      StructField("asset", assetSchema, nullable = true))(decodeHeader)

  /** The shared per-payload mapPartitions plumbing: append one column
    * computed by `f` from the payload bytes, null payloads yielding
    * null. Narrow, batch-at-a-time, partition-preserving — and staying
    * a Dataset (vs dropping to `df.rdd`) keeps the stage inside one
    * query plan so Catalyst can still prune/push around it. */
  private def appendMapped(df: DataFrame, payloadCol: String,
      field: StructField)(f: Array[Byte] => Any): DataFrame = {
    val schema = StructType(df.schema.fields :+ field)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ (if (payload == null) null else f(payload)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ----------------------------------------------------------- synthesize
  // Column-level payload builders: plant known header fields into real
  // container bytes with pure engine expressions (hex/lpad/unhex/concat),
  // so a decode query is oracle-checkable — DuckDB recomputes the planted
  // truth analytically while Spark must recover it from the bytes.
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def byteHex(c: Column): Column =
    lpad(hex(c.bitwiseAND(lit(255))), 2, "0")
  private def le16Col(c: Column): Column =
    unhex(concat(byteHex(c), byteHex(shiftright(c, 8))))
  private def le32Col(c: Column): Column =
    unhex(concat(byteHex(c), byteHex(shiftright(c, 8)),
      byteHex(shiftright(c, 16)), byteHex(shiftright(c, 24))))
  private def be16Col(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
  private def be32Col(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  /** A minimal well-formed JPEG: SOI, an APP0/JFIF segment (so the
    * decoder must actually walk segments), and a SOF0 frame header
    * carrying the planted dimensions. */
  def synthJpeg(w: Column, h: Column): Column = concat(
    lit(bytes(0xFF, 0xD8)),                                   // SOI
    lit(bytes(0xFF, 0xE0, 0x00, 0x10) ++ "JFIF".getBytes("US-ASCII")
      ++ Array.fill(10)(0.toByte)),                           // APP0, len 16
    lit(bytes(0xFF, 0xC0, 0x00, 0x11, 0x08)),                 // SOF0, len 17, prec 8
    be16Col(h), be16Col(w),
    lit(bytes(0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)))

  /** PNG magic + IHDR chunk with the planted dimensions. */
  def synthPng(w: Column, h: Column): Column = concat(
    lit(bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)),
    lit(bytes(0x00, 0x00, 0x00, 0x0D) ++ "IHDR".getBytes("US-ASCII")),
    be32Col(w), be32Col(h),
    lit(bytes(0x08, 0x06, 0x00, 0x00, 0x00)))                 // bit depth etc.

  /** RIFF/WAVE header with a PCM fmt chunk and a declared (header-only)
    * data chunk of `dataSize` bytes at 16-bit depth. */
  def synthWav(channels: Column, sampleRate: Column, dataSize: Column): Column = {
    val byteRate = sampleRate * channels * lit(2)
    val blockAlign = channels * lit(2)
    concat(
      lit("RIFF".getBytes("US-ASCII")), le32Col(dataSize + lit(36)),
      lit("WAVE".getBytes("US-ASCII")),
      lit("fmt ".getBytes("US-ASCII")), le32Col(lit(16)),
      le16Col(lit(1)), le16Col(channels), le32Col(sampleRate),
      le32Col(byteRate), le16Col(blockAlign), le16Col(lit(16)),
      lit("data".getBytes("US-ASCII")), le32Col(dataSize))
  }

  /** Deterministic frame sampling for video-like assets: pick
    * `numFrames` frame indices evenly spaced in [0, totalFrames). Pure
    * column arithmetic — no UDF. */
  def sampleFrameIndices(totalFrames: Column, numFrames: Int): Column =
    transform(sequence(lit(0), lit(numFrames - 1)),
      i => (i * totalFrames) / numFrames)

  /** Cheap payload-level metadata that needs no decode: byte size and
    * content digest, computable engine-side on both Spark and DuckDB. */
  def payloadMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"))

  /** The per-payload encoder STUB behind [[featureExtract]]: component j
    * is an md5 fold of the payload bytes — `md5(payload ++ ":j")[0:6] /
    * 2^24 - 0.5` — deterministic and engine-stable, so an external
    * oracle re-derives the exact vectors. This is the seam where a real
    * vision/audio encoder plugs in (the model libraries aren't in this
    * container); everything around it is the production plumbing. */
  def stubFeature(payload: Array[Byte], dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      graft.functions.HashImpl.hashUnit(payload ++ s":$j".getBytes("UTF-8"))
    }

  /** Feature extraction over payloads — the "run an encoder over every
    * asset" stage of a multimodal pipeline. Same narrow
    * `Dataset.mapPartitions` shape as [[decode]]: batch-at-a-time, no
    * shuffle, partition-preserving, fixed-width `array<double>` output
    * schema — exactly the contract an Arrow-batched encoder stage has on
    * a real cluster. Null payloads yield null features. This variant is
    * the MODEL-WEIGHTS seam (the stub encoder documents where a learned
    * vision/audio encoder plugs in); [[dctFeatures]] is the shipped
    * weights-free perceptual encoder over decodable rasters. */
  def featureExtract(df: DataFrame, payloadCol: String, dim: Int): DataFrame =
    appendMapped(df, payloadCol,
      StructField("features", ArrayType(DoubleType, containsNull = false),
        nullable = true))(p => stubFeature(p, dim).toSeq)

  // ---------------------------------------------- real perceptual feature
  /** The 4×4 integer core-transform matrix of H.264/AVC (Malvar,
    * Hallapuro, Karczewicz & Kerofsky, "Low-complexity transform and
    * quantization in H.264/AVC", IEEE TCSVT 2003) — the standard
    * integer-exact DCT-II approximation. Integer-exact matters here for
    * the same reason it does across this engine: a float DCT's cos()
    * sums are not bit-reproducible across engines and summation orders,
    * so they could never be oracle-pinned; this transform is pure
    * 64-bit integer arithmetic. */
  private val Dct4: Array[Array[Long]] = Array(
    Array(1L, 1L, 1L, 1L),
    Array(2L, 1L, -1L, -2L),
    Array(1L, -1L, -1L, 1L),
    Array(1L, -2L, 2L, -1L))

  /** REAL per-payload perceptual feature (the de-stubbed C39 encoder):
    * ImageIO decode → 4×4 grid of integer luma block sums (BT.601
    * scaled ×1000, 299R + 587G + 114B — sums, not means, so no division
    * noise) → 2-D 4×4 integer core transform (T·S·Tᵀ). The 16
    * coefficients are a pHash-shaped frequency signature: (0,0) is
    * total luma mass, the rest measure horizontal / vertical / diagonal
    * banding energy — a genuine image-content feature for near-dup and
    * similarity work over decoded rasters, computable on any JVM with
    * zero dependencies, and bit-identical in every engine that replays
    * the integer arithmetic (what makes `q_multimodal_features`
    * oracle-checkable over planted lossless payloads). Pixel (x, y)
    * folds into block (y·4/h, x·4/w) — floor mapping, every block
    * non-empty for w, h ≥ 4. Undecodable payloads return null
    * (degrade-don't-throw: one corrupt asset must not kill a 100 TB
    * scan). */
  def dctFeature(payload: Array[Byte]): Array[Long] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val s = Array.ofDim[Long](4, 4)
        var y = 0
        while (y < h) {
          val row = s(y * 4 / h)
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            row(x * 4 / w) +=
              299L * ((rgb >> 16) & 255) + 587L * ((rgb >> 8) & 255) +
                114L * (rgb & 255)
            x += 1
          }
          y += 1
        }
        val out = new Array[Long](16)
        var u = 0
        while (u < 4) {
          var v = 0
          while (v < 4) {
            var acc = 0L
            var i = 0
            while (i < 4) {
              var j = 0
              while (j < 4) {
                acc += Dct4(u)(i) * s(i)(j) * Dct4(v)(j)
                j += 1
              }
              i += 1
            }
            out(u * 4 + v) = acc
            v += 1
          }
          u += 1
        }
        out
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
    }

  /** [[dctFeature]] over every row's payload — the same narrow,
    * partition-preserving mapPartitions contract as [[featureExtract]],
    * emitting a fixed 16-coefficient `array<long>` `features` column
    * (null for null or undecodable payloads). Map-only: linear and
    * embarrassingly parallel at 100 TB, codec-bound per asset. */
  def dctFeatures(df: DataFrame, payloadCol: String): DataFrame =
    appendMapped(df, payloadCol,
      StructField("features", ArrayType(LongType, containsNull = false),
        nullable = true)) { p =>
      val f = dctFeature(p)
      if (f == null) null else f.toSeq
    }

  // ------------------------------------------------- real pixel codecs
  // javax.imageio ships in the JDK — the one codec library every JVM
  // executor already has, so the resample stage needs no dependency.
  // ImageIO's default stream cache writes a temp FILE per decode;
  // executors want pure in-memory codec calls.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic REAL raster image: w×h pixels of a two-tone diagonal
    * banding pattern derived from `seed`, encoded with the JDK's
    * ImageIO ("png" lossless ARGB, "jpeg" via TYPE_INT_RGB — the JPEG
    * writer rejects alpha). Actual pixel data, so [[resizeFit]]'s
    * resample path genuinely decodes and filters it — the fixture side
    * of the real-pixel contract. */
  def synthRaster(fmt: String, w: Int, h: Int, seed: Long): Array[Byte] = {
    val imgType =
      if (fmt == "jpeg") java.awt.image.BufferedImage.TYPE_INT_RGB
      else java.awt.image.BufferedImage.TYPE_INT_ARGB
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    val c1 = 0xFF000000 | ((seed * 2654435761L).toInt & 0xFFFFFF)
    val c2 = 0xFF000000 | (((seed + 17) * 2654435761L).toInt & 0xFFFFFF)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (((x + y) / 4) % 2 == 0) c1 else c2)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // ImageIO.write returns false (without throwing) when no writer
    // handles `fmt` — surface that as an error instead of silently
    // emitting a zero-byte payload a downstream decode can't explain.
    if (!javax.imageio.ImageIO.write(img, fmt, bos))
      throw new IllegalArgumentException(
        s"synthRaster: no ImageIO writer for format '$fmt' " +
          "(JDK ships png/jpeg/gif/bmp/wbmp)")
    bos.toByteArray
  }

  /** Append a REAL raster payload generated per row from (format, w, h,
    * seed) columns — same narrow, partition-preserving mapPartitions
    * shape as [[decode]]. The generator stage of a real-pixel test/demo
    * pipeline; production reads payloads from the lake instead. */
  def withRasterPayload(df: DataFrame, fmtCol: String, wCol: String,
      hCol: String, seedCol: String, out: String = "payload"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(out, BinaryType, nullable = true))
    val fi = df.schema.fieldIndex(fmtCol)
    val wi = df.schema.fieldIndex(wCol)
    val hi = df.schema.fieldIndex(hCol)
    val si = df.schema.fieldIndex(seedCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload =
          if (r.isNullAt(fi) || r.isNullAt(wi) || r.isNullAt(hi) ||
              r.isNullAt(si)) null
          else synthRaster(r.getString(fi), r.getInt(wi), r.getInt(hi),
            r.getLong(si))
        Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Header bytes of `fmt` carrying (w, h) — byte-level twins of the
    * [[synthJpeg]]/[[synthPng]] column builders, used as the degraded
    * output when a payload has no decodable pixel data. */
  private def headerOnly(fmt: String, w: Int, h: Int): Array[Byte] =
    if (fmt == "jpeg")
      bytes(0xFF, 0xD8) ++
        (bytes(0xFF, 0xE0, 0x00, 0x10) ++ "JFIF".getBytes("US-ASCII") ++
          Array.fill(10)(0.toByte)) ++
        bytes(0xFF, 0xC0, 0x00, 0x11, 0x08) ++
        Array((h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte) ++
        bytes(0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    else
      bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
        (bytes(0x00, 0x00, 0x00, 0x0D) ++ "IHDR".getBytes("US-ASCII")) ++
        Array((w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte,
          w.toByte, (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte,
          h.toByte) ++
        bytes(0x08, 0x06, 0x00, 0x00, 0x00)

  /** REAL pixel resample (the de-stubbed C40 seam): ImageIO decode →
    * bilinear Graphics2D draw into (w, h) → re-encode in the same
    * format, all JDK-only and in-memory. A payload ImageIO cannot
    * decode (header-only fixtures, truncated assets) degrades to a
    * well-formed same-format header carrying the target dims, so the
    * round-trip dimension contract holds for every parseable header.
    * Never throws — one corrupt asset must not kill a 100 TB scan. */
  def resamplePixels(
      payload: Array[Byte], fmt: String, w: Int, h: Int): Array[Byte] =
    try {
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (src == null) headerOnly(fmt, w, h)
      else {
        val imgType =
          if (fmt == "jpeg") java.awt.image.BufferedImage.TYPE_INT_RGB
          else java.awt.image.BufferedImage.TYPE_INT_ARGB
        val dst = new java.awt.image.BufferedImage(w, h, imgType)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, fmt, bos)
        bos.toByteArray
      }
    } catch {
      case scala.util.control.NonFatal(_) => headerOnly(fmt, w, h)
    }

  /** Aspect-preserving resize-to-fit: computes the target dimensions
    * with integer-exact arithmetic (the longer axis pins to the box,
    * the other scales by the same ratio, floored, min 1), then runs a
    * REAL pixel resample per asset ([[resamplePixels]]: JDK ImageIO
    * decode → bilinear redraw → same-format re-encode) in the same
    * narrow mapPartitions slot the metadata decode uses — no shuffle,
    * batch-at-a-time, partition-preserving; codec work is map-only and
    * embarrassingly parallel, so the stage scales linearly with
    * executors. `resized_payload` is a decodable image whose pixels AND
    * header carry the resized dimensions; payloads without decodable
    * pixel data degrade to a well-formed header (dimension contract
    * intact). Non-image (or unparseable) assets pass through with null
    * resize fields.
    *
    * Appends: asset (decode metadata), resized_width, resized_height,
    * resized_payload (jpeg/png only). */
  def resizeFit(
      df: DataFrame, payloadCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val d = decode(df, payloadCol)
    val w = col("asset.width").cast("long")
    val h = col("asset.height").cast("long")
    // aspect wider than the box <=> width is the binding axis
    val widthBound = w * targetH >= h * targetW
    val newW = when(widthBound, lit(targetW))
      .otherwise(greatest(lit(1), floor(w * targetH / h)).cast("int"))
    val newH = when(widthBound,
        greatest(lit(1), floor(h * targetW / w)).cast("int"))
      .otherwise(lit(targetH))
    val isImage = col("asset.width").isNotNull
    val withDims = d
      .withColumn("resized_width", when(isImage, newW))
      .withColumn("resized_height", when(isImage, newH))
    val schema = StructType(withDims.schema.fields :+
      StructField("resized_payload", BinaryType, nullable = true))
    val pIdx = withDims.schema.fieldIndex(payloadCol)
    val aIdx = withDims.schema.fieldIndex("asset")
    val wIdx = withDims.schema.fieldIndex("resized_width")
    val hIdx = withDims.schema.fieldIndex("resized_height")
    withDims.mapPartitions { rows =>
      rows.map { r =>
        val asset = r.getAs[Row](aIdx)
        val fmt = if (asset == null) null else asset.getString(1)
        val out =
          if ((fmt == "jpeg" || fmt == "png") && !r.isNullAt(wIdx))
            resamplePixels(r.getAs[Array[Byte]](pIdx), fmt,
              r.getInt(wIdx), r.getInt(hIdx))
          else null
        Row.fromSeq(r.toSeq :+ out)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
