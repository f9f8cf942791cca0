package graft

/** ~5-second container-health probe run before benchmarking, embedded in
  * every bench artifact next to `cpus`/`sf`. Three rounds of verdicts have
  * argued "environment wave vs plan regression" in prose; these fields make
  * the degradation evidence machine-readable and travel with the numbers:
  *
  *   - `seq_read_mbps`: sequential 1 MiB reads over the largest fixture
  *     parquet (page cache included on purpose — the bench reads the same
  *     files, so this is the throughput the bench actually sees)
  *   - `rand_read_mbps` / `rand_read_iops`: 4 KiB reads at deterministic
  *     pseudo-random offsets in the same file — the small-IO regime that
  *     degraded in the r12 sf10 sweep (shuffle spill, checkpoint commits)
  *   - `write_mbps` / `fsync_ms`: 8 MiB appends to a temp file plus a
  *     timed fsync — the checkpoint/spill write path
  *   - `load_avg`: 1-minute system load at probe time (the stall waves
  *     correlate with external load, round-2 diagnosis)
  *
  * All arithmetic is wall-clock bounded (~1.5 s per sub-probe) so a
  * degraded container slows the probe, never hangs it.
  */
object Preflight {
  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

  /** Runs the probe and returns a JSON object string (no trailing newline),
    * e.g. {"seq_read_mbps":744.0,...}. Never throws: a failed sub-probe
    * records -1 for its fields. */
  def probeJson(sfDir: String): String = {
    val (seq, rnd, iops) = readProbes(sfDir)
    val (wr, fs) = writeProbe()
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    s"""{"seq_read_mbps":${num(seq)},"rand_read_mbps":${num(rnd)},""" +
      s""""rand_read_iops":${num(iops)},"write_mbps":${num(wr)},""" +
      s""""fsync_ms":${num(fs)},"load_avg":${num(load)}}"""
  }

  /** (sequentialMBps, randomMBps, randomIOPS) over the largest .parquet
    * under sfDir; (-1,-1,-1) if none readable. */
  private def readProbes(sfDir: String): (Double, Double, Double) = {
    // a fixture "table.parquet" is either a single file (driver-generated)
    // or a Spark-written directory of part files — probe the largest leaf
    val target = Option(new java.io.File(sfDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet"))
      .flatMap {
        case f if f.isFile => Seq(f)
        case d => Option(d.listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
      }
      .sortBy(-_.length()).headOption
    target match {
      case Some(f) if f.length() > (1 << 16) =>
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val len = raf.length()
          // sequential: 1 MiB chunks, wrap at EOF, ~1.5 s budget
          val big = new Array[Byte](1 << 20)
          var bytes = 0L
          var pos = 0L
          val t0 = System.nanoTime()
          while ((System.nanoTime() - t0) / 1e9 < 1.5) {
            if (pos >= len) pos = 0L
            raf.seek(pos)
            val n = raf.read(big)
            if (n > 0) { bytes += n; pos += n } else pos = 0L
          }
          val seqS = (System.nanoTime() - t0) / 1e9
          // random: 4 KiB at LCG offsets (deterministic), ~1.5 s budget
          val small = new Array[Byte](4096)
          var state = 0x5deece66dL
          var rBytes = 0L
          var rOps = 0L
          val span = math.max(1L, len - small.length)
          val t1 = System.nanoTime()
          while ((System.nanoTime() - t1) / 1e9 < 1.5) {
            state = state * 6364136223846793005L + 1442695040888963407L
            raf.seek(math.floorMod(state, span))
            val n = raf.read(small)
            if (n > 0) { rBytes += n; rOps += 1 }
          }
          val rndS = (System.nanoTime() - t1) / 1e9
          (bytes / 1e6 / seqS, rBytes / 1e6 / rndS, rOps / rndS)
        } catch { case _: Throwable => (-1.0, -1.0, -1.0) }
        finally raf.close()
      case _ => (-1.0, -1.0, -1.0)
    }
  }

  /** (writeMBps, fsyncMs) via 8 MiB appends to a temp file (≤64 MiB or
    * ~1.5 s) followed by one timed fsync; (-1,-1) on failure. */
  private def writeProbe(): (Double, Double) = {
    var tmp: java.io.File = null
    try {
      tmp = java.io.File.createTempFile("graft-preflight", ".bin")
      val out = new java.io.FileOutputStream(tmp)
      try {
        val chunk = new Array[Byte](8 << 20)
        var bytes = 0L
        val t0 = System.nanoTime()
        while (bytes < (64L << 20) && (System.nanoTime() - t0) / 1e9 < 1.5) {
          out.write(chunk)
          bytes += chunk.length
        }
        val wrS = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        out.getFD.sync()
        val fsMs = (System.nanoTime() - t1) / 1e6
        (bytes / 1e6 / wrS, fsMs)
      } finally out.close()
    } catch { case _: Throwable => (-1.0, -1.0) }
    finally if (tmp != null) tmp.delete()
  }
}
