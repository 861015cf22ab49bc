"""Optional git backend for artifact versioning — A18 full parity.

Reference behavior (core/.../versioncontrol/VersionControl.scala:46-157,
GitServerManager.scala:19-60): one bare repo per application on an embedded
Gitblit server; one branch per execution named
``<executionID>_machine_id=<executor>``; each produced FileGroup is
committed under ``task.description/fileGroup.name/``; branches are merged
by a driver-side service at finish.

Ours shells out to the system ``git`` (no server, no JGit): a bare repo per
engine instance, one branch per run, the same ``<task>/<group>/`` commit
tree. The content-addressed ArtifactStore (samba_spark/artifacts.py)
remains the default, scale-appropriate backend; this one exists for
workflows that want a literal git history of artifacts.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Optional


def _git(args: list[str], cwd: str) -> str:
    proc = subprocess.run(
        ["git", *args],
        cwd=cwd,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env={**os.environ, "GIT_AUTHOR_NAME": "samba_spark",
             "GIT_AUTHOR_EMAIL": "samba@localhost",
             "GIT_COMMITTER_NAME": "samba_spark",
             "GIT_COMMITTER_EMAIL": "samba@localhost"},
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"git {' '.join(args)} failed: {proc.stderr.decode()[:500]}"
        )
    return proc.stdout.decode()


class GitArtifactBackend:
    def __init__(self, root: str):
        self.bare = os.path.join(root, "artifacts.git")
        if not os.path.exists(self.bare):
            os.makedirs(self.bare, exist_ok=True)
            _git(["init", "--bare", "--initial-branch=main", self.bare], cwd=root)

    def branch_name(self, run_id: str) -> str:
        """Per-execution branch (reference VersionControl.scala:85:
        '<executionID>_machine_id=<id>'; we are single-driver)."""
        return f"{run_id}_machine_id=driver"

    def commit_groups(self, pdf, *, task_desc: Optional[str] = None) -> str:
        """Commit every FileGroup of a (small or collected) FileGroup frame
        under <task>/<group>/ on the run's branch; returns the commit sha.

        Driver-side by design: a git history is a serialized artifact log —
        the reference funnels all commits through a single-thread executor
        for the same reason (VersionControl.scala:96). Use ArtifactStore
        for the distributed path."""
        session = pdf.session
        run_id = session.run_id
        branch = self.branch_name(run_id)
        desc = task_desc or pdf.desc or pdf.op
        rows = pdf.df.select("group_name", "files").collect()
        with tempfile.TemporaryDirectory() as wt:
            has_branch = branch in _git(["branch", "--list", branch], cwd=self.bare)
            clone_args = ["clone", "--quiet"]
            if has_branch:
                clone_args += ["--branch", branch]
            _git([*clone_args, self.bare, wt], cwd="/")
            if not has_branch:
                _git(["checkout", "--orphan", branch], cwd=wt)
                _git(["rm", "-rf", "--ignore-unmatch", "."], cwd=wt)
            for row in rows:
                gdir = os.path.join(
                    wt, desc.replace("/", "_"), str(row.group_name).replace("/", "_")
                )
                os.makedirs(gdir, exist_ok=True)
                for f in row.files or []:
                    from samba_spark.sources.filegroup import resolve_file_content

                    with open(os.path.join(gdir, f.name), "wb") as fh:
                        fh.write(resolve_file_content(f))
            _git(["add", "-A"], cwd=wt)
            _git(
                ["commit", "--allow-empty", "-m",
                 f"run {run_id}: {desc} ({len(rows)} group(s))"],
                cwd=wt,
            )
            _git(["push", "--quiet", "origin", f"HEAD:{branch}"], cwd=wt)
            return _git(["rev-parse", "HEAD"], cwd=wt).strip()

    def list_files(self, run_id: str, ref: Optional[str] = None) -> list[str]:
        """File tree of a run branch (reference web API resolves trees via
        JGit TreeWalk, DataElementAPICtrl.kt:235-314)."""
        branch = ref or self.branch_name(run_id)
        out = _git(["ls-tree", "-r", "--name-only", branch], cwd=self.bare)
        return sorted(x for x in out.splitlines() if x)

    def read_file(self, run_id: str, path: str, ref: Optional[str] = None) -> bytes:
        branch = ref or self.branch_name(run_id)
        proc = subprocess.run(
            ["git", "show", f"{branch}:{path}"],
            cwd=self.bare,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        if proc.returncode != 0:
            raise FileNotFoundError(f"{path} @ {branch}: {proc.stderr.decode()[:200]}")
        return proc.stdout

    def log(self, run_id: str) -> list[str]:
        branch = self.branch_name(run_id)
        return _git(["log", "--oneline", branch], cwd=self.bare).splitlines()

    def serve_http(self, host: str = "127.0.0.1", port: int = 0) -> "GitHttpServer":
        """Serve this bare repo over the git dumb-HTTP protocol so any
        machine can ``git clone <url>`` the artifact history — the
        network half of A18 (the reference embeds a Gitblit server for
        the same purpose, GitServerManager.scala:19-60; ours is the
        standard dumb protocol: ``git update-server-info`` keeps
        ``info/refs`` current and a stdlib static-file HTTP server does
        the rest — no smart-protocol CGI, no external dependency).
        Returns the started server; call ``.stop()`` when done."""
        server = GitHttpServer(self, host=host, port=port)
        server.start()
        return server


class GitHttpServer:
    """Read-only dumb-HTTP transport for a :class:`GitArtifactBackend`.

    The dumb protocol is plain HTTP GETs against the repository layout
    (``info/refs``, ``objects/..``, packfiles); the only server-side
    requirement is that ``git update-server-info`` has run after each
    ref update. We install git's stock ``post-update`` hook behavior by
    refreshing on ``start()`` and exposing :meth:`refresh` (the backend
    is driver-side and single-writer, so a refresh per serve window is
    sufficient; callers that commit while serving call ``refresh()``).
    GETs only — pushes over dumb HTTP are not a thing, which is the
    right property for an artifact log."""

    def __init__(self, backend: GitArtifactBackend, host: str = "127.0.0.1", port: int = 0):
        self.backend = backend
        self.host = host
        self.port = port
        self._httpd = None
        self._thread = None

    @property
    def url(self) -> str:
        """Clone URL (``git clone <url> <dest>`` — the repo is served at
        the server ROOT, so pass an explicit destination). A wildcard
        bind (0.0.0.0 / ::) is not a routable address — substitute the
        machine's hostname so the returned URL is actually connectable
        (ADVICE r7)."""
        import socket

        if self._httpd is None:
            raise RuntimeError("server not started")
        host, port = self._httpd.server_address[:2]
        if host in ("0.0.0.0", "::", ""):
            # the machine hostname is only useful if it actually
            # resolves (minimal containers often lack an /etc/hosts
            # entry for it) — otherwise loopback is the one address
            # guaranteed reachable by the caller that started us
            name = socket.gethostname()
            try:
                socket.getaddrinfo(name, port)
                host = name
            except (OSError, TypeError):
                host = "127.0.0.1"
        return f"http://{host}:{port}/"

    def refresh(self) -> None:
        """Regenerate ``info/refs`` / ``objects/info/packs`` after ref
        updates (what git's stock post-update hook runs)."""
        _git(["update-server-info"], cwd=self.backend.bare)

    def start(self) -> "GitHttpServer":
        import threading
        from functools import partial
        from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

        if self._httpd is not None:
            return self
        self.refresh()
        # serve the bare repo itself as the document root — serving its
        # PARENT would expose every sibling file under the backend root
        # (scratch data, other runs) over HTTP
        root = self.backend.bare

        class _Handler(SimpleHTTPRequestHandler):
            # The dumb protocol only ever GETs the repository LAYOUT:
            # HEAD, packed-refs, info/refs, objects/*, refs/*. Serving
            # anything else from the bare dir (config with its URLs,
            # hooks/, description) leaks repo-local configuration over
            # HTTP for no protocol benefit — allowlist the layout
            # (ADVICE r7).
            _ALLOWED_FILES = ("/HEAD", "/packed-refs")
            _ALLOWED_DIRS = ("/info", "/objects", "/refs")

            def _allowed(self) -> bool:
                # normalize BEFORE checking: a percent-encoded
                # "/objects/%2e%2e/config" would pass a raw-prefix check
                # and then be collapsed by translate_path into serving
                # the config file
                import posixpath
                from urllib.parse import unquote, urlsplit

                path = posixpath.normpath(unquote(urlsplit(self.path).path))
                return path in self._ALLOWED_FILES or any(
                    path == d or path.startswith(d + "/")
                    for d in self._ALLOWED_DIRS
                )

            def log_message(self, *args):  # quiet: tests and pipelines
                pass

            def do_GET(self):
                if not self._allowed():
                    self.send_error(404, "not part of the git dumb-HTTP layout")
                    return
                super().do_GET()

            def do_HEAD(self):
                if not self._allowed():
                    self.send_error(404, "not part of the git dumb-HTTP layout")
                    return
                super().do_HEAD()

            def do_POST(self):  # dumb HTTP is GET-only; no receive-pack
                self.send_error(405, "read-only dumb-HTTP git transport")

        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), partial(_Handler, directory=root)
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
            self._thread = None
