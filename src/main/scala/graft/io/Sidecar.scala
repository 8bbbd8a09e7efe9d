package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Crash-safe model-sidecar IO shared by the persisted ANN indexes
  * ([[graft.northstar.IvfIndex]], [[graft.northstar.IvfPqIndex]]): small
  * text files (KBs — centroids, codebooks) that live INSIDE a
  * [[ParquetTable]]'s live version dir (underscore-prefixed so Spark's
  * file index ignores them), so model state and the data it quantized
  * live and die together across rebuilds.
  *
  * The crash-safety story lives HERE, once: writes go tmp-then-atomic-
  * rename so a torn write is never visible under the real name, and reads
  * treat ANY failure (missing pointer, missing file, IO error) as
  * no-sidecar — callers rebuild from the corpus rather than trusting
  * partial state. Format-specific header/body parsing stays with each
  * index; this module owns only the placement + atomicity mechanics.
  */
object Sidecar {

  /** Write `lines` to `versionDir/fileName` via tmp + ATOMIC_MOVE. */
  def write(versionDir: Path, fileName: String, lines: Seq[String]): Unit = {
    val target = versionDir.resolve(fileName)
    val tmp = versionDir.resolve(fileName + ".tmp")
    Files.write(tmp,
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Non-empty lines of `fileName` under `tablePath`'s live version dir,
    * or None when the version pointer, the file, or the read itself is
    * missing/broken.
    */
  def read(tablePath: String, partitionColumns: Seq[String],
      fileName: String): Option[Vector[String]] =
    try {
      val p = Paths.get(
        new ParquetTable(tablePath, partitionColumns).currentPath, fileName)
      if (!Files.exists(p)) None
      else {
        import scala.jdk.CollectionConverters._
        Some(Files.readAllLines(p).asScala.filter(_.nonEmpty).toVector)
      }
    } catch { case _: Exception => None }
}
