package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{PackF32Expression, UnpackF32Expression}

/** Schema-carrier convention that lets `array<float>` columns ride the
  * JDBC path (verdict: a real migration of the LLM-pipeline tables
  * would otherwise drop the `embeddings` vector column — no engine the
  * reference targets has a portable ARRAY type).
  *
  * On write, every `array<float>` column `c` is packed to float32-LE
  * binary ([[PackF32Expression]]) and RENAMED `c__arr_f32le`; on
  * read-back, every column carrying the suffix is unpacked and the
  * name restored. The convention lives in the column NAME, so the
  * destination table itself documents which BLOBs are packed vectors
  * — no side-channel metadata table to keep in sync, and a
  * non-carrier BLOB column can never be mistaken for a vector.
  *
  * The round-trip is byte-exact (raw IEEE-754 bits, pinned
  * little-endian), so checksum verification of a synced table works
  * unchanged: [[graft.verify.Comparator.portableChecksum]] fingerprints
  * `array<float>` via the same packed-hex fold on both sides.
  */
object ArrayCarrier {

  /** Column-name suffix marking a packed `array<float>` carrier. */
  val suffix = "__arr_f32le"

  /** True when `df` has at least one column the carrier must pack. */
  def needed(df: DataFrame): Boolean = df.schema.exists(f => f.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  })

  /** Pack every `array<float>` column to a suffixed binary carrier;
    * non-vector columns pass through untouched. Rejects a frame that
    * already carries the suffix on a NON-packed column — syncing it
    * would make the read-back unpack a column that was never a vector.
    */
  def pack(df: DataFrame): DataFrame = {
    df.schema.foreach { f =>
      if (f.name.endsWith(suffix) &&
        f.dataType != org.apache.spark.sql.types.BinaryType)
        throw new IllegalArgumentException(
          s"column ${f.name} carries the $suffix marker but is " +
            s"${f.dataType.catalogString}, not binary — rename it before syncing")
    }
    val cols = df.schema.map { f =>
      f.dataType match {
        case ArrayType(FloatType, _) =>
          PackF32Expression.packF32(col(f.name)).as(f.name + suffix)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  /** Restore every suffixed carrier column to `array<float>` under its
    * original name. Case-insensitive suffix match: case-folding
    * engines (Derby upper-cases unquoted identifiers) may hand the
    * column back re-cased.
    */
  def unpack(df: DataFrame): DataFrame = {
    val sfx = suffix.toLowerCase
    val cols = df.schema.map { f =>
      if (f.name.toLowerCase.endsWith(sfx))
        UnpackF32Expression.unpackF32(col(f.name))
          .as(f.name.substring(0, f.name.length - suffix.length))
      else col(f.name)
    }
    df.select(cols: _*)
  }
}
