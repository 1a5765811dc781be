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
      def local(p: HPath) =
        java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      def crcOf(p: HPath) = new HPath(p.getParent, s".${p.getName}.crc")
      // ChecksumFileSystem keeps `.name.crc` sidecars that java.nio moves
      // bypass; a stale destination sidecar would fail every later read
      // with ChecksumException. Ordering keeps dst readable at every
      // crash point: (1) drop dst's old sidecar (dst data still old, now
      // unverified but valid), (2) atomically swap the data, (3) carry
      // src's matching sidecar over (best-effort — absence just means
      // unverified reads).
      try { fs.delete(crcOf(dst), false); () } catch { case _: Exception => () }
      java.nio.file.Files.move(local(src), local(dst),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      try {
        val srcCrc = local(crcOf(src))
        if (java.nio.file.Files.exists(srcCrc))
          java.nio.file.Files.move(srcCrc, local(crcOf(dst)),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case _: Exception => () }
    case _ =>
      FileContext.getFileContext(dst.toUri, conf)
        .rename(src, dst, Options.Rename.OVERWRITE)
  }
}
