package graft

import java.nio.file.{Files, Path}

/** Content-aware guards for derived /tmp fixtures (staged stream
  * slices, partitioned rewrites, CSV round-trip inputs).
  *
  * The r7 testdata regeneration proved the hazard of bare `_SUCCESS` /
  * `_STAGED` markers keyed only on the source *path*: a fixture staged
  * from the previous generation survives the marker check and silently
  * feeds stale rows to the oracle. Every marker now records a
  * fingerprint of the source file(s) — size + mtime — and a fixture is
  * only reused when the fingerprint still matches; otherwise the
  * fixture directory is cleared and rebuilt.
  */
object Fixtures {

  /** size+mtime fingerprint of the given source files, one line each. */
  def fingerprint(srcs: Seq[String]): String =
    srcs.map { p =>
      val f = java.nio.file.Paths.get(p)
      val size = if (Files.exists(f)) Files.size(f) else -1L
      val mtime =
        if (Files.exists(f)) Files.getLastModifiedTime(f).toMillis else -1L
      s"$p\t$size\t$mtime"
    }.mkString("\n")

  /** Marker exists and matches the current fingerprint of `srcs`. */
  def markerCurrent(marker: Path, srcs: String*): Boolean =
    Files.exists(marker) &&
      new String(Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == fingerprint(srcs)

  /** Write (or overwrite) the marker with the current fingerprint. */
  def writeMarker(marker: Path, srcs: String*): Unit = {
    Files.createDirectories(marker.getParent)
    Files.write(marker, fingerprint(srcs)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Recursively delete the contents of `dir` (and the dir itself) so a
    * rebuild starts clean — stale part-files must not survive next to a
    * fresh write.
    */
  def clearDir(dir: Path): Unit = {
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
