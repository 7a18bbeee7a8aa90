package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY
  * columns with a typed metadata struct, plus decode / resize /
  * frame-sample operators.
  *
  * Decode status: IMAGES decode for real — [[imageDecoder]] plugs the
  * JDK's own `javax.imageio` codecs (PNG/JPEG/GIF/BMP, headless-safe)
  * into [[decodePartitions]], so byte→pixels→features runs end-to-end
  * distributed (MultimodalCodecSpec proves exact pixel sums on real
  * PNGs). AUDIO decodes for real too — [[audioDecoder]] /
  * [[pcmWindowDecoder]] plug `javax.sound.sampled.AudioSystem`
  * (WAV/PCM, AIFF, AU — all stock-JDK) into the same seam, feeding
  * the SAME per-window energy grid the column pipeline computes
  * (AudioCodecSpec proves exact sample sums and window energies on
  * real WAV bytes). VIDEO alone has no JDK codec and stays STUBBED
  * (`decodePixelsStub` derives deterministic fake features from the
  * bytes) — everything around that one seam (schema, binary handling,
  * metadata structs, batch shape, partitioning) is real Spark and
  * tested, and a codec build swaps one function.
  */
object Multimodal {

  /** Attach a deterministic binary payload + typed metadata to any
    * text-bearing table (used to materialize a multimodal fixture from
    * `documents`). kind cycles image/audio/video by id.
    */
  def attachMedia(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val id = col(idCol)
    val kind = when(id % 3 === 0, "image")
      .when(id % 3 === 1, "audio").otherwise("video")
    df.select(
      id.as("media_id"),
      kind.as("kind"),
      encode(col(textCol), "utf-8").as("bytes"),
      struct(
        when(kind === "image", "png").when(kind === "audio", "wav")
          .otherwise("mp4").as("format"),
        (pmod(id * 37, lit(1216)) + 64).cast("int").as("width"),
        (pmod(id * 53, lit(656)) + 64).cast("int").as("height"),
        (pmod(id * 7, lit(240)) + 1).cast("int").as("duration_s"))
        .as("meta"))
  }

  /** 60-bit difference hash (dHash) of a row-major 6×11 grayscale
    * grid — the perceptual image fingerprint near-dup pipelines bucket
    * on: bit (r, c) = grid(r, c+1) > grid(r, c), 10 gradient bits per
    * row × 6 rows = 60 bits (the repo's simhash width, so
    * [[Dedup.hashNearDupPairs]]' 4×15 banding applies unchanged, and
    * bit 59 stays clear of the BIGINT sign — DuckDB's `<<` overflows
    * at bit 63, Spark's wraps; 60 bits sidesteps both). Pure column
    * arithmetic over the grid, so a deterministic pixel source is
    * oracle-checkable end-to-end; real decodes feed the same grid from
    * [[imageDecoder]]'s pixels (spec-proven — codecs can't run in
    * SQL).
    *
    * @param gray array<long> of 66 luma values, row-major 6 rows × 11
    *             columns (the downsample: one column overlap per
    *             gradient, the standard dHash shape)
    */
  def dHash60(gray: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(59)), i => {
        val r = floor(i / 10).cast("int")
        val c = (i % 10).cast("int")
        val idx0 = r * 11 + c
        when(element_at(gray, idx0 + 2) > element_at(gray, idx0 + 1),
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Real-codec feeder for [[dHash60]]: decode image bytes with the
    * JDK codec and block-average the luma plane down to a rows×cols
    * grid (rows=6, cols=11 for the 60-bit hash). Integer floors
    * everywhere — the grid is deterministic for given bytes, so the
    * downstream hash/banding pipeline behaves exactly as the
    * oracle-checked synthetic-grid path (q303). Returns empty on
    * undecodable bytes (the quarantine convention of
    * [[imageDecoder]]).
    */
  def imageGridDecoder(rows: Int, cols: Int)
      : Array[Byte] => Seq[Long] = {
    // fail at construction on the driver (the pcmWindowDecoder rule):
    // a 0/negative grid would divide by zero inside every task
    require(rows > 0 && cols > 0, "grid dims must be positive")
    bytes =>
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      // NonFatal only: undecodable bytes quarantine, but an OOM or
      // linkage error must kill the task, not masquerade as bad data
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) Seq.empty
    else {
      val w = img.getWidth
      val h = img.getHeight
      (0 until rows).flatMap { r =>
        (0 until cols).map { c =>
          val x0 = c * w / cols
          val x1 = math.max(x0 + 1, (c + 1) * w / cols)
          val y0 = r * h / rows
          val y1 = math.max(y0 + 1, (r + 1) * h / rows)
          var s = 0L
          var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(math.min(x, w - 1),
                math.min(y, h - 1))
              s += (299L * ((rgb >> 16) & 0xff)
                + 587L * ((rgb >> 8) & 0xff)
                + 114L * (rgb & 0xff)) / 1000L
              n += 1
              x += 1
            }
            y += 1
          }
          s / n
        }
      }
    }
  }

  /** Exact decoded-audio features — the audio analog of
    * [[ImageFeatures]]: sample rate, exact sample count, and the
    * integer sum of absolute 16-bit sample values (deterministic, so
    * the distributed decode is assertable bit-for-bit against a local
    * reference). `ok=false` quarantines undecodable payloads.
    */
  final case class AudioFeatures(sampleRate: Int, nSamples: Long,
      absSum: Long, ok: Boolean)

  /** Decode audio bytes with the stock JDK codec
    * (`javax.sound.sampled.AudioSystem`: WAV/PCM, AIFF, AU) to 16-bit
    * signed channel-0 samples. Returns null for unrecognized or
    * non-16-bit-PCM payloads (the quarantine convention). Frames are
    * parsed per the container's declared endianness; multi-channel
    * audio takes channel 0 (the dedup/fingerprint convention — energy
    * grids must be channel-stable, not mixdown-dependent).
    */
  private def readPcm16(bytes: Array[Byte]): (Int, Array[Int]) = {
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (in == null) null
    else
      try {
        val fmt = in.getFormat
        val pcm = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (fmt.getEncoding != pcm || fmt.getSampleSizeInBits != 16) null
        else {
          val raw = in.readAllBytes()
          val frameSize = fmt.getFrameSize
          val n = raw.length / frameSize
          val out = new Array[Int](n)
          val (lo, hi) = if (fmt.isBigEndian) (1, 0) else (0, 1)
          var i = 0
          while (i < n) {
            val base = i * frameSize
            out(i) = ((raw(base + hi).toInt << 8) |
              (raw(base + lo) & 0xff)).toShort.toInt
            i += 1
          }
          (fmt.getSampleRate.toInt, out)
        }
      } catch {
        case _: java.io.IOException => null
      } finally in.close()
  }

  /** REAL audio decode via the JDK codec — exact integer sample
    * statistics, quarantine on undecodable bytes. Shape: a decoder
    * function to hand to [[decodePartitions]], mirroring
    * [[imageDecoder]].
    */
  def audioDecoder(): Array[Byte] => AudioFeatures = { bytes =>
    val dec = readPcm16(bytes)
    if (dec == null) AudioFeatures(0, 0L, 0L, ok = false)
    else {
      val (rate, samples) = dec
      var s = 0L
      var i = 0
      while (i < samples.length) { s += math.abs(samples(i).toLong); i += 1 }
      AudioFeatures(rate, samples.length.toLong, s, ok = true)
    }
  }

  /** Real-codec feeder for the per-window energy grid: decode audio
    * bytes and emit one exact energy (Σ sample², in longs) per
    * hop-spaced window — the SAME window arithmetic as the column
    * pipeline [[windowEnergies]] (trailing partial window included),
    * so real decoded bytes and SQL-synthesized samples flow through
    * one grid shape and the codec-law spec can assert them equal.
    * Empty on quarantine (the [[imageGridDecoder]] convention).
    */
  def pcmWindowDecoder(windowSamples: Int, hopSamples: Int)
      : Array[Byte] => Seq[Long] = {
    // fail at construction on the driver (like windowEnergiesFold),
    // not as a mid-job executor task error inside the lambda
    require(windowSamples > 0 && hopSamples > 0,
      "window and hop must be positive")
    bytes =>
    val dec = readPcm16(bytes)
    if (dec == null) Seq.empty
    else {
      val samples = dec._2
      val n = samples.length
      if (n == 0) Seq.empty
      else (0 to (n - 1) / hopSamples).map { w =>
        val start = w * hopSamples
        val end = math.min(start + windowSamples, n)
        var e = 0L
        var i = start
        while (i < end) {
          e += samples(i).toLong * samples(i); i += 1
        }
        e
      }
    }
  }

  /** Synthesize a one-channel 16-bit PCM WAV container from samples —
    * the fixture-builder for codec-law specs and media test tables
    * (the encode direction of [[audioDecoder]], via the same JDK
    * codec so round-trips are exact: PCM is lossless).
    */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-window audio energies as a PURE COLUMN function: window w
    * (0-based, hop-spaced, trailing partial included) gets
    * Σ sample² over [w·hop, min(w·hop+windowLen, n)) — exact longs,
    * so SQL-synthesized samples are oracle-checkable end-to-end while
    * real decodes feed the identical grid from [[pcmWindowDecoder]]
    * (spec-proven — codecs can't run in SQL). Computed by the native
    * [[graft.plans.WindowEnergiesExpr]] kernel (one primitive loop
    * per row — the HOF form boxed every sample ~window/hop times and
    * dominated q304's bench cost); [[windowEnergiesFold]] keeps the
    * composable semantics it is property-pinned against. Zero samples
    * means an empty array, never a fabricated window.
    *
    * @param samples array<long> of decoded (or synthesized) sample
    *                values
    */
  def windowEnergies(samples: Column, windowLen: Int, hop: Int)
      : Column =
    graft.plans.WindowEnergiesExpr(samples, windowLen, hop)

  /** The composable fold form (interpreted HOFs) — kept as the
    * reference semantics [[graft.plans.WindowEnergiesExpr]] is
    * property-tested against (the [[Similarity.dotFold]] convention).
    * Same descending-`sequence` guard as [[sampleFrames]].
    */
  def windowEnergiesFold(samples: Column, windowLen: Int, hop: Int)
      : Column = {
    require(windowLen > 0 && hop > 0, "window and hop must be positive")
    val n = size(samples)
    val nWin = (floor((n - 1) / hop) + 1).cast("int")
    when(n >= 1,
      transform(sequence(lit(0), nWin - 1), w =>
        aggregate(
          slice(samples, w * hop + 1, lit(windowLen)),
          lit(0L), (acc, x) => acc + x * x)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** STUB decode: real pipelines decode `bytes` with a codec here.
    * This stand-in derives deterministic per-item "features" from the
    * payload so downstream plumbing (schema, joins, aggregation) is
    * exercised honestly: byte length, first byte, and a content hash
    * bucket.
    */
  def decodePixelsStub(bytes: Column): Column =
    struct(
      length(bytes).as("n_bytes"),
      conv(hex(substring(bytes, 1, 1)), 16, 10).cast("int")
        .as("first_byte"),
      (conv(substring(md5(bytes), 1, 4), 16, 10) % 256).cast("int")
        .as("content_bucket"))

  /** Resize: pure metadata transform preserving aspect fit (the pixel
    * work happens inside the decode stub's seam).
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = lit(maxSide).cast("double") / greatest(w, h).cast("double")
    val clamped = least(scale, lit(1.0))
    struct(
      meta.getField("format").as("format"),
      floor(w * clamped).cast("int").as("width"),
      floor(h * clamped).cast("int").as("height"),
      meta.getField("duration_s").as("duration_s"))
  }

  /** Decoded-image features: exact integer pixel statistics, so the
    * distributed decode is assertable bit-for-bit against a local
    * reference decode. `ok=false` marks undecodable payloads (wrong
    * magic bytes, truncated file) — kept as rows, not errors: at
    * corpus scale a bad blob must quarantine, never kill the job.
    */
  final case class ImageFeatures(width: Int, height: Int,
      lumaSum: Long, ok: Boolean)

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/
    * BMP — present in every headless JRE, no external codec needed).
    * Shape: a decoder function to hand to [[decodePartitions]];
    * `ImageIO.read` returns null for unrecognized bytes, which maps
    * to the quarantine row. Luma is the integer BT.601 weighting
    * (299R+587G+114B)/1000 summed over all pixels — deterministic,
    * overflow-safe to ~6 giga-pixels per image.
    */
  def imageDecoder(): Array[Byte] => ImageFeatures = { bytes =>
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) ImageFeatures(0, 0, 0L, ok = false)
    else {
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          s += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff)
            + 114L * (rgb & 0xff)) / 1000L
          x += 1
        }
        y += 1
      }
      ImageFeatures(img.getWidth, img.getHeight, s, ok = true)
    }
  }

  /** The per-partition imperative decode path — the Scala analog of a
    * Pandas-UDF/`mapInPandas` batch decode. A real pipeline plugs a
    * codec in `decode`; the decoder handle is constructed ONCE per
    * partition and reused across rows (the connection/codec-reuse
    * pattern `mapPartitions` exists for). The codec itself is the
    * stubbed seam — this stand-in must stay deterministic.
    */
  def decodePartitions[T](df: DataFrame,
      makeDecoder: () => Array[Byte] => T)(
      implicit enc: org.apache.spark.sql.Encoder[(Long, T)])
      : org.apache.spark.sql.Dataset[(Long, T)] = {
    import df.sparkSession.implicits._
    df.select(col("media_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decode = makeDecoder() // one decoder per partition
        rows.map { case (id, bytes) => (id, decode(bytes)) }
      }
  }

  /** Frame sampling plan for video rows: one struct per sampled frame
    * at `fps` — pure plan arithmetic, distributed via explode. Videos
    * shorter than one frame interval emit zero rows: the guard
    * matters because Spark's `sequence(0, -1)` is a DESCENDING
    * [0, -1], not empty — an unguarded explode would fabricate
    * negative frame indexes.
    */
  def sampleFrames(df: DataFrame, fps: Double): DataFrame = {
    val n = (col("meta.duration_s") * fps).cast("int")
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode_outer(when(n >= 1, sequence(lit(0), n - 1)))
          .as("frame_idx"))
      .filter(col("frame_idx").isNotNull)
      .withColumn("t_offset_s", col("frame_idx") / fps)
  }

  /** Audio analysis windows: one row per hop-spaced window over each
    * audio item's duration, trailing partial window included (its
    * `t_end_s` clamps to the duration). Same plan-arithmetic explode
    * discipline as [[sampleFrames]], same descending-`sequence` guard.
    * `energy` is the decode seam's deterministic stand-in for a real
    * per-window RMS (md5-derived, so the oracle can replay it); a
    * codec build swaps it for actual sample math inside
    * [[decodePartitions]].
    */
  def sampleWindows(df: DataFrame, windowS: Int, hopS: Int): DataFrame = {
    require(windowS > 0 && hopS > 0, "window and hop must be positive")
    val dur = col("meta.duration_s")
    val n = floor((dur - 1) / hopS).cast("int") + 1
    df.filter(col("kind") === "audio")
      .select(col("media_id"), dur.as("_dur"),
        explode_outer(when(n >= 1, sequence(lit(0), n - 1)))
          .as("win_idx"))
      .filter(col("win_idx").isNotNull)
      .withColumn("t_start_s", col("win_idx") * hopS)
      .withColumn("t_end_s",
        least(col("t_start_s") + windowS, col("_dur")))
      .withColumn("energy",
        conv(substring(
          md5(concat_ws(":", col("media_id"), col("win_idx"))), 1, 4),
          16, 10).cast("long") % 1000)
      .drop("_dur")
  }
}
