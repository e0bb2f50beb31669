package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene: no file under src/ may contain raw control
  * bytes below 0x09 (or 0x00 anywhere) — the class of incident that
  * made Dedup.scala (round 9) and Tar.scala (round 11) binary to
  * git/grep/diff until their literals were rewritten as \\u escapes.
  * Structural prevention: the next raw NUL fails the suite, not a
  * review. */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(dir.listFiles()).getOrElse(Array.empty)
      .toSeq.partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("no raw control bytes < 0x09 in any source file under src/") {
    val root = new java.io.File("src")
    assert(root.isDirectory, "run from the repo root")
    val offenders = scalaFiles(root).flatMap { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val bad = bytes.zipWithIndex.collect {
        case (b, i) if (b & 0xFF) < 0x09 => (i, b & 0xFF)
      }
      if (bad.isEmpty) None
      else Some(s"${f.getPath}: ${bad.take(5).map { case (i, b) =>
        f"offset $i: 0x$b%02X" }.mkString(", ")} (${bad.length} total)")
    }
    assert(offenders.isEmpty,
      "raw control bytes in source (use \\uXXXX escapes):\n" +
        offenders.mkString("\n"))
  }

  test("source files are valid UTF-8") {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val offenders = scalaFiles(new java.io.File("src")).flatMap { f =>
      try {
        dec.reset()
        dec.decode(java.nio.ByteBuffer.wrap(
          java.nio.file.Files.readAllBytes(f.toPath)))
        None
      } catch {
        case e: java.nio.charset.CharacterCodingException =>
          Some(s"${f.getPath}: ${e.getMessage}")
      }
    }
    assert(offenders.isEmpty, "non-UTF-8 source:\n" + offenders.mkString("\n"))
  }
}
