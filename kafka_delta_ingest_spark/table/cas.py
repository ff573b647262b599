"""Pluggable compare-and-swap backends for the commit protocol.

The log commit's only atomicity requirement is put-if-absent of the next
version file (the reference's optimistic commit retries on
VersionAlreadyExists, /root/reference/src/lib.rs:964-1024). That primitive
maps onto every storage tier:

- **local / NFS**: ``os.link`` of a fully-written temp file (hard links are
  atomic create-exclusive) — ``LocalFsCas``.
- **S3**: conditional PUT with ``If-None-Match: *`` (native since 2024), or
  the reference's original design: a DynamoDB lock table arbitrating the
  rename (README.adoc:219-234). The backend interface is the integration
  point; implementing the client is one boto3 call.
- **GCS / Azure**: ``x-goog-if-generation-match: 0`` /
  ``If-None-Match: *`` conditional create.

``InMemoryCas`` exists for tests — including loser-side race injection.
"""

from __future__ import annotations

import os
import threading
import uuid


class CasBackend:
    """put-if-absent: atomically create ``dest`` with ``content`` iff it
    does not exist. Raises FileExistsError when another writer won."""

    def put_if_absent(self, dest: str, content: bytes) -> None:
        raise NotImplementedError

    def read(self, path: str) -> bytes:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError


class LocalFsCas(CasBackend):
    """POSIX implementation: write + fsync a temp file in the destination
    directory, then hard-link it onto the final name. ``os.link`` fails
    with FileExistsError if the name exists — the local equivalent of a
    conditional PUT."""

    def put_if_absent(self, dest: str, content: bytes) -> None:
        d = os.path.dirname(dest)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, dest)
        finally:
            os.unlink(tmp)

    def read(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class InMemoryCas(CasBackend):
    """Test double with the same conditional-create semantics; thread-safe
    so commit races can be exercised deterministically."""

    def __init__(self):
        self._data: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def put_if_absent(self, dest: str, content: bytes) -> None:
        with self._lock:
            if dest in self._data:
                raise FileExistsError(dest)
            self._data[dest] = content

    def read(self, path: str) -> bytes:
        return self._data[path]

    def exists(self, path: str) -> bool:
        return path in self._data
