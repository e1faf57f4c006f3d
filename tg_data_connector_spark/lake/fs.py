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
import re
import uuid

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def uri_scheme(path: str) -> str | None:
    """Return the URI scheme of ``path`` or None for a bare local path.

    Matches RFC-3986 scheme syntax rather than the substring ``"://"``:
    Hadoop's ``Path.toString()``/``makeQualified`` canonicalize to the
    SINGLE-slash form (``file:/tmp/t``, ``hdfs:/user/t``), which a ``"://"``
    check silently misclassifies as a relative local path (it then lands
    under CWD — the bug this helper replaces)."""
    m = _SCHEME_RE.match(path)
    return m.group(0)[:-1].lower() if m else None


def local_path(path: str) -> str:
    """Strip a ``file:`` scheme (any slash form) down to the POSIX path."""
    if uri_scheme(path) == "file":
        rest = path[len("file:"):]
        if rest.startswith("//"):
            # file://host/p -> keep the absolute /p (host must be empty/local)
            rest = rest[2:]
            rest = rest[rest.index("/"):] if "/" in rest else "/"
        return rest or "/"
    return path


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

    def list_files_recursive(self, path: str) -> list[str]:
        """All file paths under ``path`` (absolute), one traversal. The
        maintenance walk (gc_orphans) uses this instead of per-directory
        listdir calls — on a DFS each listdir is a driver round trip, so a
        deep table would otherwise turn GC into an O(directories) crawl."""
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in files)
        return sorted(out)

    def mtime(self, path: str) -> float:
        """Modification time (epoch seconds) — the GC age threshold reads it
        through the seam so mock filesystems can fake clocks."""
        return os.path.getmtime(path)


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
        object stores without atomic rename (raw S3), use
        ``ConditionalPutTableFS`` instead — it maps both guarantees onto the
        store's conditional-PUT primitives; the seam keeps that choice out of
        table.py.
    """

    def __init__(self, spark, base_uri: str):
        jvm = spark._jvm
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        conf = spark._jsc.hadoopConfiguration()
        juri = jvm.java.net.URI.create(base_uri)
        # newInstance, NOT get: FileSystem.get returns the JVM-wide cached
        # instance per (scheme, authority, ugi), and the checksum toggles
        # below would silently disable checksums for every OTHER driver-side
        # user of that filesystem (event logs, checkpoints). A private
        # instance is safe to configure.
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.newInstance(juri, conf)
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

    def list_files_recursive(self, path: str) -> list[str]:
        """One ``FileSystem.listFiles(path, recursive=true)`` call — the
        namenode/store streams the whole subtree back through a single
        RemoteIterator instead of one py4j+RPC round trip per directory."""
        it = self._fs.listFiles(self._p(path), True)
        out = []
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith("."):
                out.append(st.getPath().toUri().getPath())
        return sorted(out)

    def mtime(self, path: str) -> float:
        return self._fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0


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


class ConditionalPutTableFS:
    """Raw-object-store implementation (no atomic rename, e.g. S3 without a
    rename-capable metadata layer). The commit protocol's two guarantees map
    directly onto conditional PUTs, which S3, GCS, and ABS all expose:

      * ``write_text_excl``  — PUT with ``If-None-Match: *`` (S3 since 2024,
        GCS ``ifGenerationMatch=0``): the store arbitrates create-if-absent,
        so two racing writers cannot both claim a snapshot version file.
      * ``write_text_atomic`` — a plain PUT: object stores replace objects
        atomically (a GET sees the whole old or whole new object, never a
        torn one), so the pointer swap needs no rename at all.

    The store client is injected (``put_if_absent/put/get/list_prefix/
    delete``) — an in-memory mock drives the race tests here; production
    wires a thin boto3/gcs adapter with the same five methods. Keys are the
    path strings themselves (object stores have no directories; ``makedirs``
    is a no-op and ``isdir`` means "any key under this prefix")."""

    def __init__(self, store):
        self.store = store

    def makedirs(self, path: str) -> None:
        pass  # prefixes need no creation on an object store

    def exists(self, path: str) -> bool:
        if self.store.get(path) is not None:
            return True
        return bool(self.store.list_prefix(path.rstrip("/") + "/"))

    def isdir(self, path: str) -> bool:
        return self.store.get(path) is None and bool(
            self.store.list_prefix(path.rstrip("/") + "/")
        )

    def listdir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        names = set()
        for key in self.store.list_prefix(prefix):
            rest = key[len(prefix):]
            names.add(rest.split("/", 1)[0])
        return sorted(n for n in names if not n.startswith("."))

    def list_files_recursive(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        return sorted(
            k for k in self.store.list_prefix(prefix)
            if not k.rsplit("/", 1)[-1].startswith(".")
        )

    def mtime(self, path: str) -> float:
        return self.store.mtime(path)

    def remove(self, path: str) -> None:
        if self.store.get(path) is None:
            raise FileNotFoundError(path)
        self.store.delete(path)

    def rmtree(self, path: str) -> None:
        prefix = path.rstrip("/") + "/"
        for key in list(self.store.list_prefix(prefix)):
            self.store.delete(key)
        if self.store.get(path) is not None:
            self.store.delete(path)

    def read_text(self, path: str) -> str:
        data = self.store.get(path)
        if data is None:
            raise FileNotFoundError(path)
        return data.decode("utf-8")

    def write_text_excl(self, path: str, content: str) -> None:
        if not self.store.put_if_absent(path, content.encode("utf-8")):
            raise FileExistsError(path)

    def write_text_atomic(self, path: str) -> "_StorePut":
        return _StorePut(self.store, path)


class _StorePut:
    """Buffer locally, then one PUT — atomic whole-object replace is the
    store's own guarantee, so this IS the pointer swap."""

    def __init__(self, store, path: str):
        self.store = store
        self.path = path

    def __enter__(self):
        self.buf = io.StringIO()
        return self.buf

    def __exit__(self, et, ev, tb):
        if et is None:
            self.store.put(self.path, self.buf.getvalue().encode("utf-8"))
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
