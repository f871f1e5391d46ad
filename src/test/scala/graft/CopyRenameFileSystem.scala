package graft

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Object-store emulation for the durable-zone publish caveat
  * (`SimilarityOps.publishDurableZone` documents that on rename-is-copy
  * stores the publish is not atomic): a local filesystem whose RENAME of a
  * zone build (`.build_nd_*` source) is a NON-ATOMIC deep copy + delete —
  * commit markers copied LAST (the order a well-behaved copier uses, and
  * the property the final `committed` re-probe relies on), with an
  * optional injected crash after N data files to manufacture a torn,
  * uncommitted destination. Non-publish renames (Spark's own task-commit
  * renames inside a parquet write) delegate to the real local rename so
  * only the semantics under test are emulated.
  *
  * Registered under the `copyfs:` scheme via
  * `fs.copyfs.impl = graft.CopyRenameFileSystem`.
  */
class CopyRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "copyfs"
  override def getUri: java.net.URI = java.net.URI.create("copyfs:///")

  private def isMarker(name: String): Boolean =
    name == "_SUCCESS" || name == "_GRAFT_COMMITTED"

  private def copyTree(src: Path, dst: Path): Unit = {
    val st = getFileStatus(src)
    if (st.isDirectory) {
      mkdirs(dst)
      val kids = listStatus(src)
      val (markers, data) = kids.partition(k => isMarker(k.getPath.getName))
      (data ++ markers).foreach(k =>
        copyTree(k.getPath, new Path(dst, k.getPath.getName)))
    } else {
      if (!isMarker(src.getName)) {
        CopyRenameFileSystem.dataFilesCopied += 1
        CopyRenameFileSystem.crashAfterDataFiles.foreach { n =>
          if (CopyRenameFileSystem.dataFilesCopied > n)
            throw new java.io.IOException(
              s"simulated object-store crash mid-copy (after $n files)")
        }
      }
      FileUtil.copy(this, src, this, dst, false, getConf)
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!src.getName.startsWith(".build_nd_")) return super.rename(src, dst)
    // HDFS rename contract, minus atomicity: an existing destination
    // directory receives the source AS A CHILD (the lost-race shape the
    // resolver must re-probe); otherwise the source is copied to the
    // destination path — file by file, markers last, crash injectable
    val target = if (exists(dst)) new Path(dst, src.getName) else dst
    copyTree(src, target)
    delete(src, true)
    true
  }
}

object CopyRenameFileSystem {
  /** Crash the publish copy after this many DATA files (markers excluded
    * from the count and always ordered last, so a crash always tears the
    * destination BEFORE it can look committed). None = no crash. */
  @volatile var crashAfterDataFiles: Option[Int] = None
  @volatile var dataFilesCopied: Int = 0

  def reset(): Unit = { crashAfterDataFiles = None; dataFilesCopied = 0 }
}
