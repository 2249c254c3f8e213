package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** Zip-archive extraction (SURVEY §2.1 S10).
  *
  * Reference: `PBI Python Scripts/Zip Folder Extraction Script.ipynb:61`
  * unpacks the Garmin mass-export zip before any scanning.
  *
  * Kept as a DRIVER-SIDE prep utility by design (SURVEY §2.1 S10): the
  * export zip is a one-time, single-archive input, so there is nothing to
  * distribute; after extraction every downstream read is a normal
  * distributed file scan. (If many archives ever had to be opened at
  * scale, the `binaryFile` source + per-partition unzip would replace
  * this.) Entry paths are validated against zip-slip before writing.
  */
object ZipUtil {

  /** Extract `zipPath` under `destDir`; returns the extracted paths. */
  def extract(zipPath: String, destDir: String): Seq[Path] = {
    val dest = Paths.get(destDir).toAbsolutePath.normalize()
    Files.createDirectories(dest)
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.filterNot(_.isDirectory).map { entry =>
        val target = dest.resolve(entry.getName).normalize()
        require(target.startsWith(dest),
          s"zip entry escapes destination: ${entry.getName}")
        Files.createDirectories(target.getParent)
        val in  = zf.getInputStream(entry)
        val out = new BufferedOutputStream(new FileOutputStream(target.toFile))
        try in.transferTo(out) finally { in.close(); out.close() }
        target
      }.toList
    } finally zf.close()
  }
}
