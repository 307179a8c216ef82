package graft.sources

import java.io.{BufferedInputStream, File, FileInputStream}
import java.nio.file.Files
import java.util.zip.{GZIPInputStream, ZipInputStream}

/** Archive source support: fetch/expand, then run the archive's ordered
  * sub-commands against the extracted files (src/utils/archive.lisp;
  * clojure core.clj:328-399). Driver-side expansion — archives are a
  * packaging convenience, the data inside them is what scales. */
object Archive {

  /** The `.dbf` members of a zip, expanded ONCE per (path, mtime) —
    * `LOAD DBF FROM x.zip` needs the member list for the data read
    * AND (under `create table`) for the header DDL; without the cache
    * each caller would re-extract the whole archive. */
  private val dbfCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Seq[String]]
  def dbfMembers(zipPath: String): Seq[String] = {
    val key = (zipPath, new File(zipPath).lastModified)
    dbfCache.computeIfAbsent(key, _ => {
      val dir = expand(zipPath)
      val members = Option(dir.listFiles()).getOrElse(Array.empty[File])
        .filter(_.getName.toLowerCase.endsWith(".dbf"))
        .map(_.getAbsolutePath).sorted.toSeq
      require(members.nonEmpty, s"no .dbf member inside $zipPath")
      members
    })
  }

  /** Expand a .zip (or single-file .gz) into a fresh temp directory. */
  def expand(archivePath: String): File = {
    val dst = Files.createTempDirectory("graft-archive").toFile
    val lower = archivePath.toLowerCase
    if (lower.endsWith(".zip")) {
      val zin = new ZipInputStream(
        new BufferedInputStream(new FileInputStream(archivePath)))
      try {
        var e = zin.getNextEntry
        while (e != null) {
          val f = new File(dst, e.getName)
          // zip-slip guard: entries must stay under the target dir
          require(f.getCanonicalPath.startsWith(
            dst.getCanonicalPath + File.separator),
            s"archive entry escapes extraction dir: ${e.getName}")
          if (e.isDirectory) f.mkdirs()
          else {
            f.getParentFile.mkdirs()
            Files.copy(zin, f.toPath)
          }
          zin.closeEntry()
          e = zin.getNextEntry
        }
      } finally zin.close()
    } else if (lower.endsWith(".gz")) {
      val name = new File(archivePath).getName.stripSuffix(".gz")
      val gin = new GZIPInputStream(
        new BufferedInputStream(new FileInputStream(archivePath)))
      try Files.copy(gin, new File(dst, name).toPath)
      finally gin.close()
    } else {
      throw new IllegalArgumentException(
        s"unsupported archive format: $archivePath (zip/gz)")
    }
    dst
  }
}
