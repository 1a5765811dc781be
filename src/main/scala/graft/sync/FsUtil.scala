package graft.sync

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, LocalFileSystem,
  Options, RawLocalFileSystem, Path => HPath}

/** Filesystem-portable atomic file replacement for the store pointer and
  * sync watermark commits. */
private[graft] object FsUtil {

  /** Replace `dst` with `src` atomically.
    *
    * On local filesystems, Hadoop's `FileContext.rename(OVERWRITE)` falls
    * back to delete-then-rename (only the HDFS `AbstractFileSystem`
    * overrides `renameInternal` atomically), which would open a window
    * with NO pointer — a crash inside it strips the store, and a
    * concurrent reader sees an absent pointer. So local paths go through
    * `java.nio` `ATOMIC_MOVE` (the guarantee POSIX rename gives), and
    * only genuinely-remote filesystems use the FileContext path, where
    * HDFS renames atomically and object stores provide their own
    * put-semantics. */
  def atomicReplace(fs: FileSystem, conf: Configuration,
      src: HPath, dst: HPath): Unit = fs match {
    case _: LocalFileSystem | _: RawLocalFileSystem =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(fs.makeQualified(src).toUri.getPath),
        java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // drop the checksum sidecar the ChecksumFileSystem wrote for the
      // temp name — the moved file's data is already on disk
      fs match {
        case _: LocalFileSystem =>
          val crc = new HPath(src.getParent, s".${src.getName}.crc")
          try { fs.delete(crc, false); () } catch { case _: Exception => () }
        case _ => ()
      }
    case _ =>
      FileContext.getFileContext(dst.toUri, conf)
        .rename(src, dst, Options.Rename.OVERWRITE)
  }
}
