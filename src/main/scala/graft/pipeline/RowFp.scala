package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side replica of the SQL expression
  * `xxhash64(conv_id, turn_idx, text)` (seed 42, field-chained), so the
  * shuffle-free clustered path produces manifests with the same input
  * fingerprints as the Column-based path (PartitionedSink compares them
  * on resume). Parity is asserted in tests against the SQL function.
  */
object RowFp {

  private def hashString(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)
  }

  /** xxhash64(conv_id: string, turn_idx: int, text: string). */
  def of(convId: String, turnIdx: Int, text: String): Long = {
    var h = 42L
    if (convId != null) h = hashString(convId, h)
    h = XXH64.hashInt(turnIdx, h)
    if (text != null) h = hashString(text, h)
    h
  }
}
