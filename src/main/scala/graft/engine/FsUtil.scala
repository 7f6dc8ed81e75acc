package graft.engine

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Local-filesystem helpers shared by queries and specs. */
object FsUtil {

  /** Depth-first recursive delete; no-op when `root` does not exist. */
  def deleteRecursively(root: Path): Unit =
    if (Files.exists(root))
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
}
