package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extract runs as `mapPartitions` over the binary
  * column — the Scala analog of a Pandas-UDF batch stage.
  *
  * The actual codec call is STUBBED (`DecoderStub`): the container has no
  * image/audio libraries, so the stub derives deterministic fake features
  * from the bytes. Everything around it — schema, batching, partition
  * flow, output shape — is the real production plumbing; swapping in a
  * JNI/javacpp decoder is a one-function change.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)
  ))

  /** Wrap a raw binary column into the (payload, meta) shape. Byte-length
    * metadata is computed inline (codegen); format/dims are filled by the
    * decoder stage since they require parsing the container.
    */
  def asMedia(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(null).cast(StringType).as("format"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      length(col(binCol)).cast(LongType).as("n_bytes")
    ))

  /** Feature schema produced by the decode stage. */
  def decodedSchema(idField: StructField): StructType = StructType(Seq(
    idField,
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(FloatType))
  ))

  /** The stub decoder: deterministic pseudo-features from payload bytes.
    * REPLACE with a real codec (e.g. javacpp-ffmpeg / ImageIO) in
    * production — signature and batch shape stay identical.
    *
    * The fake is derived from the portable Karp–Rabin fingerprint
    * (`acc*31 + code mod 1e9+7` over the normalized UTF-8 text, the
    * same kernel as [[graft.functions.KrHashExpression]]) so every
    * metadata field is exact modular arithmetic a SQL oracle can
    * reproduce — the decode *plumbing* gets a full cross-engine
    * rows+schema+hash gate instead of a rows-only check.
    */
  object DecoderStub {
    val featureDim = 8
    private val P = 1000000007L

    def decode(bytes: Array[Byte]): (String, Int, Int, Array[Float]) = {
      // ??? <- real decode goes here; deterministic fake below
      val h = graft.functions.KrHashExpression.compute(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes))
      val fmt = if (h % 2 == 0) "png" else "jpg"
      val w = (16 + h % 1024).toInt
      val ht = (16 + (h / 1024) % 1024).toInt
      val feats = Array.tabulate(featureDim) { i =>
        // stable per-content feature in [-1, 1]
        ((h * 31 + i * 2654435761L) % P).toFloat / P * 2f - 1f
      }
      (fmt, w, ht, feats)
    }
  }

  /** Decode/feature-extract stage: one pass, partition-parallel, batch
    * shape = partition iterator (streaming — never materializes the
    * partition). Input needs (idCol: any, binCol: binary).
    */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val idField = df.schema(idCol)
    val outSchema = decodedSchema(idField)
    val enc = RowEncoder.encoderFor(outSchema)
    val in = df.select(col(idCol), col(binCol))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.get(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (fmt, w, h, feats) =
          if (bytes == null) (null, 0, 0, Array.empty[Float])
          else DecoderStub.decode(bytes)
        Row(id, fmt, w, h,
          if (bytes == null) 0L else bytes.length.toLong, feats)
      }
    }(enc)
  }

  /** Resize stage: payload → payload at (width × height), meta rewritten.
    * Same `mapPartitions` batch shape as [[decodeFeatures]] — the stub
    * passes bytes through untouched (no codec in this container); a real
    * implementation swaps only the per-element function.
    */
  def resize(df: DataFrame, idCol: String, binCol: String,
      width: Int, height: Int): DataFrame = {
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(
      idField,
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)
    ))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        // ??? <- real resample goes here; stub passes payload through
        Row(r.get(0), bytes, width, height)
      }
    }(enc)
  }

  /** Frame/sample extraction for time-based media: emits `n` evenly
    * spaced byte windows per payload (the real implementation would emit
    * decoded frames; the windowing/explode plumbing is identical).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val width = greatest(length(col(binCol)).cast("int") / n, lit(1))
    df.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), lit(n - 1)),
        i => substring(col(binCol).cast("string"), (i * width + 1).cast("int"), lit(32))
      )).as(Seq("frame_idx", "frame_sample"))
    )
  }
}
