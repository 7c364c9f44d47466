package graft.hadoop

import java.net.URI
import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, FileStatus,
  LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem with in-process chmod.
  *
  * Without the Hadoop native library (not shipped in Spark's
  * `hadoop-client-api`), `RawLocalFileSystem.setPermission` shells out
  * to a forked `chmod` process — and every local file CREATE and MKDIR
  * calls it (create → setPermission, mkOneDirWithMode → setPermission,
  * both virtual). On a large-heap JVM a fork costs ~5–40 ms of page
  * -table copying, so every parquet task file, streaming state-store
  * delta, offset/commit log entry, and `_temporary` committer dir pays
  * a fixed fork tax; measured here: `fs.create+close` 10.6 ms vs
  * 0.08 ms for a raw java create, and a streaming micro-batch with 16
  * state stores spent ~280 ms/batch in commits alone. This subclass
  * replaces the fork with `java.nio.file.Files.setPosixFilePermissions`
  * — the same syscall `chmod(1)` would make, minus the process.
  * (Sticky/setuid bits cannot be expressed via the NIO API; nothing in
  * a Spark scratch/checkpoint tree uses them.)
  *
  * Wired in via `spark.hadoop.fs.file.impl` at session build
  * ([[graft.Sessions.tune]]) — it must land in the Hadoop conf before
  * the first `file://` access caches a FileSystem instance. The
  * checksum wrapper is preserved ([[NioLocalFileSystem]] wraps the
  * patched raw FS exactly as stock `LocalFileSystem` wraps stock raw),
  * so on-disk behavior — .crc siblings included — is byte-identical to
  * stock; only the syscall path changes. A cluster deployment with
  * `libhadoop.so` installed gets the same effect from NativeIO and
  * does not need this shim.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, perm: FsPermission): Unit = {
    val bits = perm.toShort.toInt
    val set = EnumSet.noneOf(classOf[PosixFilePermission])
    NioRawLocalFileSystem.Flags.foreach { case (f, m) =>
      if ((bits & m) != 0) set.add(f)
    }
    Files.setPosixFilePermissions(pathToFile(p).toPath, set): Unit
  }

  /** Stock `getFileLinkStatus` forks `readlink` on EVERY call to learn
    * a possible symlink target — and the FileContext stack calls it on
    * every rename (`AbstractFileSystem.renameInternal`), which is once
    * or more per checkpoint-log entry and per state-store delta commit
    * (measured: 880 readlink forks across one 4-micro-batch stream).
    * `Files.isSymbolicLink` answers the only question that path is
    * asking without leaving the process; genuine symlinks (never
    * present in a Spark scratch/checkpoint tree) still take the stock
    * fork path for exact target/metadata fidelity. */
  override def getFileLinkStatus(f: Path): FileStatus =
    if (Files.isSymbolicLink(pathToFile(f).toPath)) super.getFileLinkStatus(f)
    else getFileStatus(f)
}

private object NioRawLocalFileSystem {
  private val Flags: Seq[(PosixFilePermission, Int)] = Seq(
    OWNER_READ -> 0x100, OWNER_WRITE -> 0x80, OWNER_EXECUTE -> 0x40,
    GROUP_READ -> 0x20, GROUP_WRITE -> 0x10, GROUP_EXECUTE -> 0x8,
    OTHERS_READ -> 0x4, OTHERS_WRITE -> 0x2, OTHERS_EXECUTE -> 0x1)
}

/** The `fs.file.impl` entry point: stock checksum wrapper over the
  * fork-free raw FS. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** The `fs.AbstractFileSystem.file.impl` entry point — the FileContext
  * stack (Structured Streaming's default CheckpointFileManager, among
  * others) resolves `file://` through `AbstractFileSystem`, NOT
  * `fs.file.impl`, so it needs its own binding or every checkpoint
  * create/mkdir/rename keeps forking. Mirrors stock `LocalFs` exactly
  * (ChecksumFs over the raw local FS), swapping in the fork-free raw. */
class NioRawLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf, "file", false)

class NioLocalFs(uri: URI, conf: Configuration)
  extends ChecksumFs(new NioRawLocalFs(uri, conf))
