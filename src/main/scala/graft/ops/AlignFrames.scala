package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** polars `align_frames` (py-polars/src/polars/functions/eager.py:819):
  * align N frames on key columns — every output frame carries the SAME
  * ordered key spine, with null-filled rows injected where a frame lacks a
  * key, and each frame's original column order preserved.
  *
  * Spark shape: the spine is the distinct union of key tuples (`how=full`,
  * the default) or the first frame's keys (`how=left`, the documented
  * fast path); each aligned frame is spine LEFT JOIN frame. All joins key
  * on the same columns, so at scale every stage shuffles on one
  * partitioning and AQE can reuse it; a small spine broadcasts.
  *
  * polars returns the frames sorted by key; we sort each output so the
  * row-alignment contract (same key at the same position in every frame)
  * holds under Spark's unordered execution. The spine is DISTINCT key
  * tuples, so a frame with duplicate keys keeps its own multiplicity
  * (polars leaves the duplicate-key case to the join strategy; the
  * distinct spine is the one shape that keeps all frames row-aligned).
  */
object AlignFrames {
  def align(frames: Seq[DataFrame], on: Seq[String],
            how: String = "full",
            descending: Boolean = false): Seq[DataFrame] = {
    require(frames.nonEmpty, "align_frames: need at least one frame")
    val keyCols: Seq[Column] = on.map(col)
    val spine = how match {
      case "left" => frames.head.select(keyCols: _*).distinct()
      case "full" => frames.map(_.select(keyCols: _*))
        .reduce(_ unionByName _).distinct()
      case other => throw new IllegalArgumentException(
        s"align_frames: unsupported how=$other (full|left)")
    }
    val ord = on.map(c => if (descending) col(c).desc else col(c).asc)
    frames.map { f =>
      spine.join(f, on, "left").select(f.columns.map(col).toSeq: _*)
        .orderBy(ord: _*)
    }
  }
}
