package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns plus typed metadata, exactly as
  * they would in a 100 TB lakehouse (parquet binary + struct metadata).
  *
  * The Spark-side machinery — schema, partition-preserving mapPartitions
  * transforms, batch shape — is real and tested. The actual codec calls
  * are STUBBED behind [[decodeStub]] (this container has no image/audio
  * libraries): a deterministic fake that yields plausible metadata from
  * the payload bytes. Swapping in a real decoder changes only that
  * function.
  */
object Multimodal {

  /** Metadata schema attached to every decoded asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Wrap a text/bytes column as a binary payload column. */
  def asPayload(c: Column): Column = encode(c, "UTF-8")

  /** STUB decoder: derives deterministic pseudo-metadata from payload
    * bytes. A real implementation would parse the container header
    * (JPEG/PNG/WAV...) here — the surrounding plumbing is unchanged. */
  def decodeStub(payload: Array[Byte]): Row = {
    val n = payload.length.toLong
    val sig = if (payload.isEmpty) 0 else java.util.Arrays.hashCode(payload)
    val fmt = (math.floorMod(sig, 3): Int) match {
      case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
    }
    Row(n, fmt, 64 + math.floorMod(sig, 1024), 64 + math.floorMod(sig >> 10, 1024))
  }

  /** Decode payloads partition-by-partition. Runs as a narrow
    * `Dataset.mapPartitions` transform: no shuffle, batch-at-a-time,
    * preserving input partitioning — the shape a Pandas-UDF/Arrow decode
    * stage has on a real cluster. Staying a Dataset (vs dropping to
    * `df.rdd`) keeps the decode inside one query plan: Catalyst can
    * still prune/push around it and codegen the stages on either side,
    * instead of a plan-breaking RDD round-trip. */
  def decode(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("asset", assetSchema, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ (if (payload == null) null else decodeStub(payload)))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
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
}
