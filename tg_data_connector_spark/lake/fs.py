"""Filesystem seam for the lake's metadata I/O.

Every manifest/pointer byte the table format reads or writes goes through this
interface, so the POSIX coupling lives in exactly one class: a DFS backend
(HDFS/S3 via their atomic-rename or conditional-put primitives) implements the
same five operations without touching table.py. The commit protocol only
requires two filesystem guarantees, both stated per-method below:

  * ``write_text_excl``  — create-fails-if-exists (O_EXCL): two racing writers
    cannot claim the same snapshot version file.
  * ``replace``          — atomic swap of the version pointer: readers see the
    old or the new snapshot, never a torn file.
"""

from __future__ import annotations

import io
import os
import uuid


class LocalTableFS:
    """POSIX implementation (local disk or any shared POSIX mount like NFS
    with proper O_EXCL semantics)."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def remove(self, path: str) -> None:
        """Delete one file (maintenance: orphan GC, snapshot expiry)."""
        os.remove(path)

    def rmtree(self, path: str) -> None:
        """Delete a directory tree (maintenance: orphaned commit dirs)."""
        import shutil

        shutil.rmtree(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_excl(self, path: str, content: str) -> None:
        """Create the file, failing if it already exists (compare-and-create).
        The snapshot-version claim: at most one writer wins a given version."""
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(content)

    def write_text_atomic(self, path: str) -> "_AtomicWrite":
        return _AtomicWrite(path)


class HadoopTableFS:
    """DFS implementation over the JVM Hadoop FileSystem API (py4j): any
    scheme the session's Hadoop conf resolves — ``hdfs://``, ``s3a://``,
    ``gs://``, ``file://``. Only the table's *metadata* bytes flow through
    here (version files, manifest shards, pointers — all small), so per-call
    py4j overhead is irrelevant; the data files are read/written by Spark's
    own Hadoop IO on the same URIs.

    Commit-protocol guarantees, mapped to Hadoop primitives:

      * ``write_text_excl``  — ``FileSystem.create(path, overwrite=false)``:
        the namenode arbitrates the create atomically on HDFS (and conditional
        create on stores that support it), so two racing writers cannot both
        claim a snapshot version; the loser surfaces as ``FileExistsError``.
      * ``write_text_atomic`` — temp file + ``FileContext.rename(OVERWRITE)``:
        the POSIX-rename-equivalent atomic pointer swap on HDFS. On pure
        object stores without atomic rename (raw S3), point the pointer swap
        at a rename-capable metadata root or a conditional-put wrapper — the
        seam keeps that choice out of table.py.
    """

    def __init__(self, spark, base_uri: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        conf = spark._jsc.hadoopConfiguration()
        juri = jvm.java.net.URI.create(base_uri)
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(juri, conf)
        # LocalFileSystem would otherwise shadow every metadata file with a
        # .crc twin; checksums add nothing for small JSON we re-read at once
        self._fs.setWriteChecksum(False)
        self._fs.setVerifyChecksum(False)
        self._fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(juri, conf)
        self._Path = jvm.org.apache.hadoop.fs.Path

    def _p(self, path: str):
        return self._Path(path)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def listdir(self, path: str) -> list[str]:
        # hidden entries (.crc twins, ._COPYING_ temps) follow the Hadoop
        # convention of a leading dot; the table format never names files so
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(self._p(path))
            if not st.getPath().getName().startswith(".")
        )

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(
            self._fs.getFileStatus(p).isDirectory()
        )

    def remove(self, path: str) -> None:
        if not self._fs.delete(self._p(path), False):
            raise FileNotFoundError(path)

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def _create(self, path: str, content: str, overwrite: bool) -> None:
        from py4j.protocol import Py4JJavaError

        try:
            out = self._fs.create(self._p(path), overwrite)
        except Py4JJavaError as ex:  # map the JVM collision to the contract
            name = ex.java_exception.getClass().getName()
            if "AlreadyExists" in name:
                raise FileExistsError(path) from None
            raise
        try:
            data = content.encode("utf-8")
            out.write(bytearray(data))  # py4j: bytearray -> byte[]
        finally:
            out.close()

    def write_text_excl(self, path: str, content: str) -> None:
        self._create(path, content, overwrite=False)

    def write_text_atomic(self, path: str) -> "_HadoopAtomicWrite":
        return _HadoopAtomicWrite(self, path)


class _HadoopAtomicWrite:
    """Buffer locally, write a temp object, then FileContext.rename with
    OVERWRITE — the readers see the old or the new pointer, never a torn
    write. Mirrors ``_AtomicWrite`` for the DFS seam."""

    def __init__(self, hfs: HadoopTableFS, path: str):
        self.hfs = hfs
        self.path = path
        self.tmp = path + f".tmp-{uuid.uuid4().hex}"

    def __enter__(self):
        self.buf = io.StringIO()
        return self.buf

    def __exit__(self, et, ev, tb):
        if et is not None:
            return False
        hfs = self.hfs
        hfs._create(self.tmp, self.buf.getvalue(), overwrite=True)
        jvm, gw = hfs._jvm, hfs._gateway
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = overwrite
        hfs._fc.rename(hfs._p(self.tmp), hfs._p(self.path), opts)
        return False


class _AtomicWrite:
    """Write-to-temp + fsync + atomic rename. Used for the ``_current``
    pointer (phase 2 of the commit)."""

    def __init__(self, path: str):
        self.path = path
        self.tmp = path + f".tmp-{uuid.uuid4().hex}"

    def __enter__(self):
        self.f = open(self.tmp, "w")
        return self.f

    def __exit__(self, et, ev, tb):
        if et is None:
            self.f.flush()
            os.fsync(self.f.fileno())
            self.f.close()
            os.replace(self.tmp, self.path)  # the atomic publish
        else:
            self.f.close()
            try:
                os.remove(self.tmp)
            except OSError:
                pass
        return False
