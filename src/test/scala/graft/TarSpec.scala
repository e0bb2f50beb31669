package graft

import graft.sources.Tar
import org.apache.spark.sql.functions._

/** ustar TAR source/sink: byte-level round-trip, header checksum
  * enforcement, padding edges, and the WebDataset sample regrouping. */
class TarSpec extends SparkSpec {

  private def writeShard(dir: java.nio.file.Path, name: String,
      entries: Seq[(String, Array[Byte])], gzip: Boolean = false): String = {
    val f = dir.resolve(name)
    val bytes = Tar.recordBytes(entries)
    val out: java.io.OutputStream =
      if (gzip) new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
      else java.nio.file.Files.newOutputStream(f)
    out.write(bytes); out.close()
    f.toString
  }

  test("round-trips entries byte-for-byte, incl. empty and 512-multiple payloads") {
    val dir = java.nio.file.Files.createTempDirectory("tar1")
    val entries = Seq(
      "a.txt" -> "hello tar".getBytes("UTF-8"),
      "empty.bin" -> Array.empty[Byte],
      "block.bin" -> Array.tabulate[Byte](1024)(i => (i * 7).toByte),
      "utf8-名前.txt" -> "ünïcödé".getBytes("UTF-8"))
    writeShard(dir, "s.tar", entries)
    writeShard(dir, "s2.tar.gz", entries, gzip = true)
    for (glob <- Seq(s"$dir/s.tar", s"$dir/s2.tar.gz")) {
      val got = Tar.read(spark, glob).orderBy("entry_ix").collect()
        .map(r => (r.getString(2), r.getLong(3), r.getAs[Array[Byte]](4)))
      assert(got.map(_._1).toSeq == entries.map(_._1))
      got.zip(entries).foreach { case ((_, sz, payload), (_, expected)) =>
        assert(sz == expected.length)
        assert(java.util.Arrays.equals(payload, expected))
      }
    }
  }

  test("archives written by GNU-compatible layout parse; corrupt checksum raises with context") {
    val dir = java.nio.file.Files.createTempDirectory("tar2")
    val path = writeShard(dir, "bad.tar", Seq("x.txt" -> "abc".getBytes))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    bytes(0) = 'y'.toByte // name byte flipped -> checksum now wrong
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val e = intercept[org.apache.spark.SparkException] {
      Tar.read(spark, path).collect()
    }
    assert(e.getMessage.contains("checksum") || e.getCause != null)
    // over-long names fail loud at WRITE time, not as silent truncation
    intercept[IllegalArgumentException] {
      Tar.recordBytes(Seq(("x" * 150) -> Array.empty[Byte]))
    }
  }

  test("webdatasetSamples regroups by basename with extension-keyed parts") {
    val dir = java.nio.file.Files.createTempDirectory("tar3")
    writeShard(dir, "w.tar", Seq(
      "000001.txt" -> "caption one".getBytes,
      "000001.json.gz" -> Array[Byte](1, 2),
      "000002.txt" -> "caption two".getBytes,
      "000002.cls" -> "en".getBytes))
    val samples = Tar.webdatasetSamples(Tar.read(spark, s"$dir/w.tar"))
      .orderBy("sample_key").collect()
    assert(samples.length == 2)
    val m1 = samples(0).getAs[Map[String, Array[Byte]]]("parts")
    assert(m1.keySet == Set("txt", "json.gz")) // full multi-dot extension
    assert(new String(m1("txt"), "UTF-8") == "caption one")
    val m2 = samples(1).getAs[Map[String, Array[Byte]]]("parts")
    assert(m2.keySet == Set("txt", "cls"))
    assert(new String(m2("cls"), "UTF-8") == "en")
  }
}
