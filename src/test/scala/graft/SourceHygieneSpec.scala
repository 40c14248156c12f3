package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene: no raw control bytes in any `.scala` file.
  * A single embedded NUL (the r7 `kFolds` sentinel) makes grep
  * classify the whole file as binary, which silently EXCLUDES it from
  * every grep-driven review wave and leak scan — the scan prints
  * "binary file matches" instead of the offending line, and a reviewer
  * sweeping for a pattern never sees the file's code at all. Escapes
  * (`"\u0000..."`) express the same value text-safely.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private val allowed: Set[Byte] = Set(0x09, 0x0A, 0x0D).map(_.toByte)

  private def scalaFiles(root: Path): Seq[Path] = {
    val walk = Files.walk(root)
    try walk.iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .toList
    finally walk.close()
  }

  test("no raw control bytes in src/**/*.scala") {
    val root = Paths.get("src")
    assert(Files.isDirectory(root), s"expected to run from the repo root, cwd=${Paths.get("").toAbsolutePath}")
    val offenders = scalaFiles(root).flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val bad = bytes.zipWithIndex.collect {
        case (b, i) if (b >= 0x00 && b < 0x20) && !allowed.contains(b) => (b, i)
      }
      bad.headOption.map { case (b, i) =>
        f"$p: byte 0x$b%02x at offset $i"
      }
    }
    assert(offenders.isEmpty,
      "control bytes found (use \\uXXXX escapes):\n" + offenders.mkString("\n"))
  }
}
