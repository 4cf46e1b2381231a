package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: media ride through the pipeline as opaque
  * `binary` columns with typed metadata alongside. The Spark-side
  * plumbing (schema, partitioning, batch shapes, deterministic frame
  * addressing) is real; the actual media DECODE is stubbed behind
  * [[decodeFeaturesStub]] because no image/audio codec ships in this
  * environment — swap that single function for a real decoder (e.g. a
  * JNI codec or `mapInPandas` on a PySpark front) without touching any
  * caller.
  */
object Multimodal {

  /** Typed metadata for a binary payload: byte length, content digest,
    * and a magic-bytes sniff of the first 4 bytes. */
  def metaExtract(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("byte_len"),
      sha2(col(binCol), 256).as("sha256"),
      lower(hex(substring(col(binCol), 1, 4))).as("magic"))

  /** Deterministic frame sampling: treat the payload as fixed-size
    * frames, keep every `stride`-th frame index, address each frame by
    * byte range, digest it. posexplode keeps (idx, frame) pairs aligned;
    * the guard keeps short payloads from producing a descending
    * sequence(0,-1). */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0,
      s"frameBytes=$frameBytes and stride=$stride must be positive " +
        "(i % 0 is NULL in SQL — every frame would silently drop)")
    val nFrames = (length(col(binCol)) / frameBytes).cast("long")
    val idxs = when(nFrames > 0,
      filter(sequence(lit(0L), nFrames - 1), i => i % stride === 0))
      .otherwise(array().cast("array<bigint>"))
    df.select(col(idCol), col(binCol).as("__bin"), explode(idxs).as("frame_idx"))
      .select(
        col(idCol),
        col("frame_idx"),
        md5(col("__bin").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes))).as("frame_md5"))
  }

  /** STUB — deterministic fake for the media decode / feature-extract
    * step (no codecs in this container). Emits byte-summary features
    * (length, mean byte value, fraction of bytes above 0x20) computed
    * from the raw bytes in one aggregate pass, so downstream
    * schema/partition logic is exercised end-to-end AND the output is
    * SQL-expressible — DuckDB reproduces the same three numbers from
    * the text, which upgrades mm_decode_features from a rows-only
    * check to a hash-verified one (the previous crc32/xxhash64 fake
    * had no oracle counterpart). A real deployment replaces this body
    * with an actual decoder; the signature (binary -> array<double>)
    * is the contract. */
  def decodeFeaturesStub(bin: Column): Column = {
    // one compiled byte scan (plans/ByteStats) — the per-byte
    // hex/conv HOF fold it replaces was interpreted and allocated a
    // hex string per byte; integer sums are order-free so the swap
    // changes no hash
    val acc = graft.plans.ByteStats(bin)
    // empty payload -> all-zero features (an array<double> contract
    // cannot carry nulls through typed consumers)
    val n = nullif(length(bin).cast("long"), lit(0L))
    array(
      length(bin).cast("double"),
      coalesce(acc.getField("s").cast("double") / n, lit(0.0)),
      coalesce(acc.getField("k").cast("double") / n, lit(0.0)))
  }

  /** Resize planning: aspect-preserving fit of (w, h) so the LONG side
    * becomes `target`, plus the tile-batch shape a vision encoder
    * consumes (ceil-div tile counts). Pure integer floor math — no
    * float scale factor, so the planned dims are bit-identical across
    * engines and cluster sizes. The pixel resample itself belongs to
    * the decode stub's swap-in point ([[decodeFeaturesStub]]); what the
    * ENGINE owns is the deterministic geometry every downstream batch
    * shape depends on. */
  def resizePlan(df: DataFrame, idCol: String, wCol: String, hCol: String,
                 target: Int, tile: Int): DataFrame = {
    require(target > 0 && tile > 0,
      s"target=$target and tile=$tile must be positive")
    df.select(col(idCol), col(wCol), col(hCol),
      expr(s"($wCol * $target) div greatest($wCol, $hCol)").as("new_w"),
      expr(s"($hCol * $target) div greatest($wCol, $hCol)").as("new_h"))
      .withColumn("n_tiles",
        expr(s"((new_w + ${tile - 1}) div $tile) * ((new_h + ${tile - 1}) div $tile)"))
  }
}
