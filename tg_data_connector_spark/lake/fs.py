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
