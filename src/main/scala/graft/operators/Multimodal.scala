package graft.operators

import graft.{Q, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the
  * pipeline as opaque `binary` columns with typed metadata, and all
  * decode/feature steps are per-row column expressions (or, for real
  * codecs, mapPartitions over batches) — never driver-side loops.
  *
  * The container has no image/audio codecs, so DECODE IS A
  * DETERMINISTIC FAKE (clearly marked below): dimensions and frame
  * features are derived from the payload's rolling hash. The
  * Spark-side shape — binary column, metadata struct, batch-friendly
  * per-partition layout, pushdown-safe projections — is real and is
  * what a codec-backed implementation would plug into.
  */
object Multimodal {

  /** Rows-only check: binary payload + extracted metadata. */
  val meta = Q.rowsOnly("mm_meta") { (spark, dir) =>
    val payload = col("text").cast("binary")
    val fp = Hashing.charFold(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        payload.as("payload"),
        octet_length(payload).cast("long").as("n_bytes"),
        base64(substring(payload, 1, 8)).as("magic"),
        // ── STUB DECODE: width/height/duration derived from the
        //    payload hash, standing in for a real codec ──
        (lit(64L) + (fp % 16L) * 16L).as("width"),
        (lit(64L) + ((fp / 16L) % 16L) * 16L).as("height"),
        ((fp % 300L) / 10.0).as("duration_s"),
        substring(payload, 1, 16).as("frame_sample"))
      .orderBy("doc_id")
  }

  /** Rows-only check: per-"frame" feature extraction — samples k
    * offsets from the payload and emits one feature row per frame,
    * the shape a video/audio frame-sampler produces at scale.
    */
  val frames = Q.rowsOnly("mm_frames") { (spark, dir) =>
    val payload = col("text").cast("binary")
    Tables.documents(spark, dir)
      .select(col("doc_id"), payload.as("payload"),
        octet_length(payload).as("n_bytes"))
      .select(col("doc_id"), col("n_bytes"),
        posexplode(sequence(lit(0L), least(lit(3L), (col("n_bytes") / 64).cast("long")))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("frame_idx"),
        (col("col") * 64).cast("long").as("byte_offset"),
        // STUB frame feature: hash of the offset window
        ((col("doc_id") * 31 + col("col") * 7) % 256).cast("long").as("feature"))
      .orderBy("doc_id", "frame_idx")
  }

  val all: Seq[Q] = Seq(meta, frames)
}
