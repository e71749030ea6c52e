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
  * [[Decoders]] carries one REAL pure-JVM codec (P6/PPM header + pixel
  * parse) and a deterministic Karp–Rabin fake standing in for the
  * jpg/png/ffmpeg codecs this container doesn't ship. Everything around
  * the per-payload call — schema, batching, partition flow, output
  * shape — is the real production plumbing; swapping the fake for a
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

  /** Payload decoders. Two codecs behind one dispatch:
    *
    *  - a REAL pure-JVM P6 (binary PPM) parser — header (magic,
    *    whitespace/comments, width, height, maxval) plus the full RGB
    *    pixel plane, rejecting truncated or corrupt payloads — with
    *    8 channel/luminance statistics as the feature vector;
    *  - the deterministic Karp–Rabin fake for every other payload
    *    (`acc*31 + code mod 1e9+7` over the normalized UTF-8 text, the
    *    same kernel as [[graft.functions.KrHashExpression]]), standing
    *    in for the jpg/png/ffmpeg codecs this container doesn't ship.
    *    Its exact modular arithmetic keeps the decode *plumbing* under
    *    a full cross-engine rows+schema+hash gate.
    *
    * Swapping the fake for a JNI/javacpp decoder is a one-function
    * change; the PPM path shows the real shape end-to-end.
    */
  object Decoders {
    val featureDim = 8
    private val P = 1000000007L

    private def isPpmWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

    /** Real P6 parse: `"P6" <ws> width <ws> height <ws> maxval <one ws>
      * <w*h*3 raw bytes>`, `#`-comments legal inside header whitespace
      * (netpbm spec). Returns None for anything malformed — bad magic,
      * missing fields, maxval outside (0, 255] (2-byte samples not
      * supported), or a pixel plane shorter than the header promises —
      * so corrupt media degrades to the fallback codec instead of
      * throwing mid-partition.
      *
      * Features (all in [0, 1], computed in one pass over the plane):
      * mean R/G/B, mean/min/max luminance (ITU-R 601 weights),
      * contrast (max-min luminance), nonzero-pixel fraction.
      */
    def decodePpm(bytes: Array[Byte]): Option[(String, Int, Int, Array[Float])] = {
      if (bytes == null || bytes.length < 12 ||
        bytes(0) != 'P' || bytes(1) != '6') return None
      var i = 2
      def skipWs(): Boolean = {
        val start = i
        var loop = true
        while (loop && i < bytes.length) {
          if (isPpmWs(bytes(i))) i += 1
          else if (bytes(i) == '#') {
            while (i < bytes.length && bytes(i) != '\n') i += 1
          } else loop = false
        }
        i > start
      }
      def readInt(): Int = {
        var v = 0L
        val start = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v <= Int.MaxValue) {
          v = v * 10 + (bytes(i) - '0'); i += 1
        }
        if (i == start || v > Int.MaxValue) -1 else v.toInt
      }
      if (!skipWs()) return None
      val w = readInt(); if (w <= 0) return None
      if (!skipWs()) return None
      val h = readInt(); if (h <= 0) return None
      if (!skipWs()) return None
      val maxval = readInt(); if (maxval <= 0 || maxval > 255) return None
      // exactly ONE whitespace byte separates maxval from the raster
      if (i >= bytes.length || !isPpmWs(bytes(i))) return None
      i += 1
      val nPix = w.toLong * h
      // divide rather than multiply: w and h can each approach 2^31,
      // so nPix*3 would overflow Long and let an adversarial header
      // through to an out-of-bounds pixel read
      if (nPix > (bytes.length - i).toLong / 3) return None // truncated plane
      var (sr, sg, sb) = (0.0, 0.0, 0.0)
      var minL = Double.MaxValue; var maxL = 0.0; var nonzero = 0L
      var p = 0L
      var off = i
      while (p < nPix) {
        val r = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val b = bytes(off + 2) & 0xff
        sr += r; sg += g; sb += b
        val lum = 0.299 * r + 0.587 * g + 0.114 * b
        if (lum < minL) minL = lum
        if (lum > maxL) maxL = lum
        if (r + g + b > 0) nonzero += 1
        p += 1; off += 3
      }
      val m = maxval.toDouble
      val n = nPix.toDouble
      val meanLum = (0.299 * sr + 0.587 * sg + 0.114 * sb) / n / m
      Some(("ppm", w, h, Array(
        (sr / n / m).toFloat, (sg / n / m).toFloat, (sb / n / m).toFloat,
        meanLum.toFloat, (minL / m).toFloat, (maxL / m).toFloat,
        ((maxL - minL) / m).toFloat, (nonzero / n).toFloat)))
    }

    /** Deterministic fake for non-PPM payloads (no jpg/png codec in
      * this container): format/dims/features from the portable KR
      * fingerprint — exact modular arithmetic a SQL oracle reproduces.
      */
    def decodeFake(bytes: Array[Byte]): (String, Int, Int, Array[Float]) = {
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

    def decode(bytes: Array[Byte]): (String, Int, Int, Array[Float]) =
      decodePpm(bytes).getOrElse(decodeFake(bytes))
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
          else Decoders.decode(bytes)
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
    * spaced 32-byte windows per payload (the real implementation would
    * emit decoded frames; the windowing/explode plumbing is identical).
    * Windows slice the BINARY payload directly — a round-trip through
    * a string cast would mangle non-UTF-8 media bytes to U+FFFD and
    * misalign offsets computed in bytes against positions applied in
    * characters.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val width = greatest(length(col(binCol)).cast("int") / n, lit(1))
    df.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), lit(n - 1)),
        i => col(binCol).substr((i * width + 1).cast("int"), lit(32))
      )).as(Seq("frame_idx", "frame_sample"))
    )
  }
}
