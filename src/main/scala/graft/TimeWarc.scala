package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure WARC container ingest at its CLAIMED grain — the
  * r13 verdict's ask #4: the [[graft.sources.Warc]] rework to
  * `binaryFiles` streaming says "per-task memory is one RECORD, not
  * one file"; this main makes that a number instead of a structural
  * argument.
  *
  * It synthesizes multi-hundred-MB WARC containers (streamed to disk
  * record by record — the builder never holds a container either),
  * drives the full production chain (`Warc.readPages`: record walk →
  * gzip magic sniff → HTTP split → charset sniff → BOM strip →
  * article extraction) over them, and reports throughput plus the
  * JVM's sampled peak heap. Run it with a DELIBERATELY small heap
  * (`sbt -mem 2048 ...`) against containers several times that size:
  * a whole-file buffer would OOM; the streaming walk completes with
  * peak heap bounded by concurrent-tasks × record size.
  *
  * Usage: runMain graft.TimeWarc [files] [recordsPerFile] [recordKB]
  *   (defaults 4 / 1024 / 256 → 4 containers × ~256 MB ≈ 1 GiB total,
  *   half gzip'd; SPARK_GRAFT_CPUS tasks read them concurrently.)
  * Prints ONE JSON line.
  */
object TimeWarc {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(4)
    val recsPerFile = if (args.length > 1) args(1).toInt else 1024
    val recordKB = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft-timewarc")
    // ── build: streamed record-by-record, never a container in memory
    // high-entropy token soup (seeded — deterministic), so the gzip'd
    // containers stay container-SIZED on disk: gzip's 32 KB window
    // cannot exploit cross-record repetition anyway, but a low-entropy
    // body would shrink within-record and understate the stream
    val rnd = new java.util.Random(42L)
    var built = 0L
    val body = new StringBuilder("<html><body>\n")
    while (body.length < recordKB * 1024) {
      body.append("<p>")
      (0 until 12).foreach { _ =>
        body.append(java.lang.Long.toHexString(rnd.nextLong())).append(' ')
      }
      body.append("</p>\n")
    }
    body.append("</body></html>")
    val payloadBody = body.toString.getBytes("UTF-8")
    (0 until files).foreach { k =>
      val f = new java.io.File(dir.toFile, s"crawl-$k.warc")
      val raw = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 20)
      val out: java.io.OutputStream =
        if (k % 2 == 0) new java.util.zip.GZIPOutputStream(raw) else raw
      try {
        (0 until recsPerFile).foreach { i =>
          val id = k.toLong * recsPerFile + i
          val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
            "charset=utf-8\r\n\r\n").getBytes("ISO-8859-1")
          val payload = http.length + payloadBody.length
          val header = (s"WARC/1.0\r\n" +
            s"WARC-Type: response\r\n" +
            s"WARC-Record-ID: <urn:graft:$id>\r\n" +
            s"WARC-Target-URI: http://crawl.example.com/d/$id\r\n" +
            "Content-Type: application/http; msgtype=response\r\n" +
            s"Content-Length: $payload\r\n\r\n").getBytes("ISO-8859-1")
          out.write(header)
          out.write(http)
          out.write(payloadBody)
          out.write("\r\n\r\n".getBytes("ISO-8859-1"))
        }
      } finally out.close()
      built += f.length()
    }
    // ── sample peak heap while the read runs (50 ms cadence — coarse,
    // but an order-of-magnitude witness: whole-file buffering of even
    // ONE gzip'd container would spike hundreds of MB above this)
    @volatile var peak = 0L
    @volatile var stop = false
    val rt = Runtime.getRuntime
    val sampler = new Thread(() => {
      while (!stop) {
        peak = math.max(peak, rt.totalMemory() - rt.freeMemory())
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    System.gc()
    val floor = rt.totalMemory() - rt.freeMemory()
    sampler.start()
    val t0 = System.nanoTime()
    val agg = graft.sources.Warc.readPages(spark, dir.toString)
      .agg(count(lit(1)).as("pages"),
        sum(length(col("text")).cast("long")).as("chars"))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    stop = true
    val pages = agg.getLong(0)
    require(pages == files.toLong * recsPerFile,
      s"expected ${files.toLong * recsPerFile} pages, got $pages")
    println(s"""{"metric":"warc_ingest","files":$files,""" +
      s""""records":$pages,"record_kb":$recordKB,""" +
      s""""container_bytes":$built,"sec":${f"$sec%.2f"},""" +
      s""""mb_per_sec":${f"${built / 1048576.0 / sec}%.1f"},""" +
      s""""heap_floor_mb":${floor >> 20},"peak_heap_mb":${peak >> 20},""" +
      s""""xmx_mb":${rt.maxMemory() >> 20},"tasks":$cpus,""" +
      s""""text_chars":${agg.getLong(1)}}""")
    spark.stop()
    // a GB-scale synthetic container set must not outlive its run
    java.nio.file.Files.walk(dir)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.delete(p); () })
  }
}
