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


def _aws_error_code(exc: Exception) -> str:
    """Error code from a botocore-shaped ClientError (response dict),
    empty string for anything else."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return str(resp.get("Error", {}).get("Code", ""))
    return ""


class S3Cas(CasBackend):
    """Conditional-PUT backend for S3-compatible object stores.

    put-if-absent = ``PutObject`` with ``IfNoneMatch="*"`` (native S3
    since 2024; honored by GCS interop and MinIO). A 412
    ``PreconditionFailed`` means another committer created the version
    file first → ``FileExistsError``, which ``Table.commit`` treats as
    VersionAlreadyExists and retries at the next version — the same
    optimistic loop the reference runs (src/lib.rs:964-1024), with the
    conditional PUT replacing its DynamoDB lock table (README.adoc:219-234).

    ``client`` is boto3-shaped (``put_object`` / ``get_object`` /
    ``head_object`` raising ClientError with ``response["Error"]["Code"]``);
    pass ``boto3.client("s3")`` in production or a fake in tests — the
    conflict protocol needs no network to verify. Filesystem-style paths
    map to keys by dropping the leading separator, so a table rooted at
    ``/warehouse/events`` commits to ``s3://<bucket>/warehouse/events/_log/``.
    """

    def __init__(self, bucket: str, client=None, key_prefix: str = ""):
        if client is None:  # pragma: no cover — needs boto3 + credentials
            import boto3

            client = boto3.client("s3")
        self.bucket = bucket
        self.client = client
        self.key_prefix = key_prefix

    def _key(self, path: str) -> str:
        return self.key_prefix + path.replace(os.sep, "/").lstrip("/")

    def put_if_absent(self, dest: str, content: bytes) -> None:
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._key(dest),
                Body=content,
                IfNoneMatch="*",
            )
        except Exception as e:  # noqa: BLE001 — classify by AWS error code
            if _aws_error_code(e) in ("PreconditionFailed", "412"):
                raise FileExistsError(dest) from e
            raise

    def read(self, path: str) -> bytes:
        return self.client.get_object(Bucket=self.bucket, Key=self._key(path))[
            "Body"
        ].read()

    def exists(self, path: str) -> bool:
        try:
            self.client.head_object(Bucket=self.bucket, Key=self._key(path))
            return True
        except Exception as e:  # noqa: BLE001
            if _aws_error_code(e) in ("404", "NoSuchKey", "NotFound"):
                return False
            raise


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
