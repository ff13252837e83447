"""Commit-primitive backends for the persisted-index (and store)
manifest/lease machinery — the object-store-portability seam.

Everything durability-critical in `functions/index_store.py` (and the
point store's manifest flip) reduces to FOUR small-object primitives over
a handful of tiny control files (MANIFEST.json, WRITER.lock):

1. exclusive CREATE of a small object (lease acquisition);
2. conditional PUBLISH of a small object (the manifest CAS flip);
3. conditional REFRESH / DELETE keyed on current content (lease
   heartbeat, verified release, one-winner steal);
4. last-modified AGE of a small object (lease expiry).

On a POSIX volume those map to O_EXCL open, tmp-file + atomic
``os.replace``, read-verify-then-act, and mtime — which is exactly what
the code did inline through round 12, implicitly assuming a single
shared filesystem. On S3-class object storage none of those primitives
exist (no rename, no O_EXCL, no mtime touch); what DOES exist is
CONDITIONAL PUT/DELETE — put-if-none-match and put/delete-if-match on an
entity tag (S3 conditional writes, GCS ``ifGenerationMatch``, Azure blob
``If-Match``) — the same class of primitive the reference delegates to
etcd for (leases and compare-and-swap keys,
internal/configprovider/cluster_leader.go:21-43, clustering.go:84-131;
the reference never trusts its data plane for coordination either).

This module gives both implementations behind one interface:

- ``PosixBackend`` — the default; byte-for-byte the round-12 behavior
  (same syscalls, same crash windows, same documented TOCTOU residuals).
- ``SimulatedCondPutBackend`` — the conditional-put CONTRACT, exercised
  for real by the whole lifecycle test suite: no rename, no O_EXCL, no
  utime; every mutation is a full-object put/delete conditioned on the
  object's current content, made atomic by a process-wide mutex standing
  in for the object service's own serialization. Objects are stored as
  plain local files so crash-simulation tests (manual lock writes,
  faked mtimes) drive both backends identically; ``age_sec`` reads the
  file mtime as the simulated service's Last-Modified.

What the seam deliberately does NOT cover: bulk DATA files (parquet
batch directories). Those are already object-store-safe by construction
— they are written to paths no reader consults until the manifest flip
commits them, so plain puts suffice; only the tiny control objects need
conditional semantics.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from typing import Optional

#: publish() sentinel: replace unconditionally (no fence observed).
UNCONDITIONAL = object()


class CommitConflictError(RuntimeError):
    """A conditional primitive lost its race: the object's current
    content no longer matches what the caller observed. index_store maps
    this to ConcurrentIndexWriterError at its API boundary."""


class PosixBackend:
    """The round-12 inline primitives, verbatim: O_EXCL create,
    tmp + os.replace publish, mtime heartbeat/age, rename-aside steal,
    read-verify-then-act refresh/release (whose microsecond TOCTOU
    windows are documented in writer_lock and backstopped by the
    manifest CAS)."""

    name = "posix"

    def read(self, path: str) -> Optional[str]:
        """Object content, or None if absent / unreadable."""
        try:
            with open(path) as f:
                return f.read()
        except OSError:
            return None

    def create_exclusive(self, path: str, content: str) -> bool:
        """Create-if-absent. False if the object already exists. A
        failure AFTER the create succeeded (ENOSPC, signal) removes the
        empty object before propagating — an empty lease is TTL-gated,
        so leaking one blocks later writers for the full TTL."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, content.encode())
        except BaseException:
            with contextlib.suppress(OSError):
                os.close(fd)
            with contextlib.suppress(OSError):
                os.unlink(path)
            raise
        os.close(fd)
        return True

    def publish(self, path: str, content: str, observed=UNCONDITIONAL) -> None:
        """Atomic replace via tmp + os.replace. `observed` (the raw
        content the caller's fence check read) is NOT re-verified here:
        on POSIX the caller's parsed-fence compare plus the writer lease
        is the round-12 contract, and rename gives atomicity of the flip
        itself. Conditional backends enforce `observed` instead."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)

    def age_sec(self, path: str) -> Optional[float]:
        try:
            return time.time() - os.path.getmtime(path)
        except OSError:
            return None

    def refresh_if_content(self, path: str, content: str) -> Optional[bool]:
        """Heartbeat: bump last-modified iff the object still holds
        `content`. True = refreshed (ours), False = provably not ours,
        None = read failed (transient — caller keeps trying)."""
        cur = self.read(path)
        if cur is None:
            # Unreadable is NOT proof of loss — but still try the touch:
            # the utime on a vanished path fails harmlessly, and on a
            # read blip it keeps a live lease fresh.
            with contextlib.suppress(OSError):
                os.utime(path, None)
            return None
        if cur != content:
            return False
        with contextlib.suppress(OSError):
            os.utime(path, None)
        return True

    def remove_stale(self, path: str, observed: Optional[str]) -> bool:
        """One-winner removal of a diagnosed-stale lease: rename the
        object ASIDE to a unique name — of N contenders exactly one
        rename succeeds (the losers' source vanishes) — then drop the
        aside. `observed` is unused on POSIX (rename's one-winner
        property is on the path, not the content)."""
        import uuid as uuidlib

        aside = f"{path}.stale.{os.getpid()}.{uuidlib.uuid4().hex}"
        try:
            os.rename(path, aside)
        except FileNotFoundError:
            return False
        with contextlib.suppress(OSError):
            os.unlink(aside)
        return True

    def delete_if_content(self, path: str, content: str) -> None:
        """Verified release: unlink iff the object still holds `content`
        (read-verify-then-unlink; the residual TOCTOU is the documented
        round-12 window)."""
        if self.read(path) == content:
            with contextlib.suppress(OSError):
                os.unlink(path)


class SimulatedCondPutBackend:
    """The conditional-put contract an S3/GCS/Azure deployment would
    implement, simulated over local files: NO rename, NO O_EXCL, NO
    utime — every mutation is a full-object write or delete conditioned
    on the object's current content, serialized by `_SERVICE_MUTEX`
    (standing in for the object service's own internal serialization of
    conditional requests; real services return 412 Precondition Failed
    where this raises CommitConflictError / returns False).

    Mapping to real APIs — create_exclusive = PUT If-None-Match:* ;
    publish(observed) = PUT If-Match:<etag> (observed=None -> If-None-
    Match:*, UNCONDITIONAL -> plain PUT); refresh_if_content /
    delete_if_content / remove_stale = PUT/DELETE If-Match:<etag>.
    Content stands in for the etag (tiny control objects, so comparing
    bytes == comparing a content hash); age_sec reads the service's
    Last-Modified (file mtime here — which also lets the existing
    crash-simulation tests fake lease age on both backends the same
    way). The heartbeat is a same-content conditional PUT: object stores
    have no touch, so a lease refresh REWRITES the object, bumping
    Last-Modified server-side."""

    name = "condput"

    # One mutex for the whole "service" (class-level: all backend
    # instances in this process talk to the same simulated service).
    _SERVICE_MUTEX = threading.RLock()

    def read(self, path: str) -> Optional[str]:
        with self._SERVICE_MUTEX:
            try:
                with open(path) as f:
                    return f.read()
            except OSError:
                return None

    def _put(self, path: str, content: str) -> None:
        # A direct write, NOT write-tmp-then-rename: the simulated
        # service's puts are atomic by contract (the mutex), and using
        # rename here would smuggle the POSIX primitive back in.
        with open(path, "w") as f:
            f.write(content)

    def create_exclusive(self, path: str, content: str) -> bool:
        with self._SERVICE_MUTEX:
            if os.path.exists(path):
                return False
            self._put(path, content)
            return True

    def publish(self, path: str, content: str, observed=UNCONDITIONAL) -> None:
        with self._SERVICE_MUTEX:
            if observed is not UNCONDITIONAL:
                try:
                    with open(path) as f:
                        cur = f.read()
                except OSError:
                    cur = None
                if cur != observed:
                    raise CommitConflictError(
                        f"conditional put lost: {path} moved since the "
                        f"fence read"
                    )
            self._put(path, content)

    def age_sec(self, path: str) -> Optional[float]:
        try:
            return time.time() - os.path.getmtime(path)
        except OSError:
            return None

    def refresh_if_content(self, path: str, content: str) -> Optional[bool]:
        with self._SERVICE_MUTEX:
            try:
                with open(path) as f:
                    cur = f.read()
            except OSError:
                return None  # transient per contract: caller keeps trying
            if cur != content:
                return False
            self._put(path, content)  # same-content PUT bumps Last-Modified
            return True

    def remove_stale(self, path: str, observed: Optional[str]) -> bool:
        """DELETE If-Match on the stale content the contender diagnosed:
        of N contenders exactly one delete succeeds — the service rejects
        the rest because the object is gone (or was already re-created by
        the winner)."""
        with self._SERVICE_MUTEX:
            try:
                with open(path) as f:
                    cur = f.read()
            except OSError:
                return False
            if observed is not None and cur != observed:
                return False  # moved since diagnosis: not our steal
            os.unlink(path)
            return True

    def delete_if_content(self, path: str, content: str) -> None:
        with self._SERVICE_MUTEX:
            try:
                with open(path) as f:
                    cur = f.read()
            except OSError:
                return
            if cur == content:
                os.unlink(path)


_default_backend = PosixBackend()


def get_default_backend():
    return _default_backend


def set_default_backend(backend) -> None:
    """Swap the process-wide commit backend (tests parametrize the
    lifecycle suite over both; a real object-store deployment would
    install its conditional-put implementation once at startup)."""
    global _default_backend
    _default_backend = backend


def load_json(backend, path: str) -> Optional[dict]:
    raw = backend.read(path)
    return None if raw is None else json.loads(raw)


__all__ = [
    "UNCONDITIONAL",
    "CommitConflictError",
    "PosixBackend",
    "SimulatedCondPutBackend",
    "get_default_backend",
    "set_default_backend",
    "load_json",
]
