"""A17 element mutation + A18 git artifact backend parity."""

import os

import pytest
from pyspark.sql import functions as F

from samba_spark.blackbox import run_command
from samba_spark.sources.filegroup import FileGroupTemplate
from samba_spark.versioncontrol import GitArtifactBackend


@pytest.fixture()
def group_src(engine, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "data.txt").write_text("v1\n")
    return engine.file_groups(FileGroupTemplate.of_file(str(d / "data.txt"), name="g"))


def test_git_backend_round_trip(engine, group_src, tmp_path):
    """Per-run branch, <task>/<group>/ tree, multi-stage history — the
    reference's commit layout (VersionControl.scala:85-129)."""
    backend = GitArtifactBackend(str(tmp_path / "vcs"))
    sha1 = backend.commit_groups(group_src, task_desc="load")
    out = run_command(group_src, "tr v V < data.txt > data2.txt")
    sha2 = backend.commit_groups(out, task_desc="transform")
    assert sha1 != sha2
    files = backend.list_files(engine.run_id)
    assert "load/g/data.txt" in files
    assert "transform/g/data2.txt" in files
    assert backend.read_file(engine.run_id, "transform/g/data2.txt") == b"V1\n"
    assert len(backend.log(engine.run_id)) == 2


def test_git_backend_isolates_runs(engine, group_src, tmp_path, spark):
    from samba_spark.session import ProvSession

    backend = GitArtifactBackend(str(tmp_path / "vcs"))
    backend.commit_groups(group_src, task_desc="load")
    other = ProvSession(spark, name="other_run", prov_dir=str(tmp_path / "p2"))
    assert backend.branch_name(engine.run_id) != backend.branch_name(other.run_id)
    with pytest.raises(Exception):
        backend.list_files(other.run_id)  # no branch for the other run yet
    other.stop()


def test_element_update_and_delete(engine, sf_smoke):
    """A17: update-element-value and delete-element with latest-wins reads
    (reference CassandraDBDao.scala:150-170)."""
    nation = engine.read_parquet(f"{sf_smoke}/nation.parquet", "nation").with_elements()
    nation.persist_elements()
    rows = (
        engine.store.table("elements")
        .where(F.col("task_id") == nation.task_id)
        .limit(2)
        .collect()
    )
    e0, e1 = rows[0], rows[1]
    engine.store.update_element_value(
        engine.run_id, e0.task_id, e0.element_id, [["patched"]], '{"patched": true}'
    )
    engine.store.delete_element(engine.run_id, e1.task_id, e1.element_id)
    current = {
        r.element_id: r
        for r in engine.store.read_elements_current(engine.run_id).collect()
    }
    assert current[e0.element_id].values == [["patched"]]
    assert e1.element_id not in current
    # untouched elements unchanged
    others = [k for k in current if k not in (e0.element_id, e1.element_id)]
    assert len(others) == 23


def test_git_http_serve_clone_round_trip(engine, group_src, tmp_path):
    """A18 network story: a real `git clone` over the dumb-HTTP server
    fetches the run branch, and the cloned tree matches the committed
    <task>/<group>/ layout byte-for-byte. Commits made while serving
    become visible after refresh()."""
    import subprocess

    backend = GitArtifactBackend(str(tmp_path / "vcs"))
    backend.commit_groups(group_src, task_desc="load")
    server = backend.serve_http()
    try:
        branch = backend.branch_name(engine.run_id)
        dst = str(tmp_path / "clone1")
        subprocess.run(
            ["git", "clone", "--quiet", "--branch", branch, server.url, dst],
            check=True, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        assert (tmp_path / "clone1" / "load" / "g" / "data.txt").read_bytes() == b"v1\n"

        # a commit made while serving appears after refresh()
        out = run_command(group_src, "tr v V < data.txt > data2.txt")
        backend.commit_groups(out, task_desc="transform")
        server.refresh()
        dst2 = str(tmp_path / "clone2")
        subprocess.run(
            ["git", "clone", "--quiet", "--branch", branch, server.url, dst2],
            check=True, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        assert (
            tmp_path / "clone2" / "transform" / "g" / "data2.txt"
        ).read_bytes() == b"V1\n"

        # transport is read-only: POST (smart-protocol push entry) is 405
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            server.url + "git-receive-pack", data=b"x", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("POST should be rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 405

        # document root is the bare repo itself: sibling files under the
        # backend root must NOT be reachable (the first cut served the
        # parent directory and exposed them)
        (tmp_path / "vcs" / "secret.txt").write_text("not served")
        try:
            urllib.request.urlopen(server.url + "secret.txt")
            raise AssertionError("sibling file must not be served")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # while in-repo files still are
        with urllib.request.urlopen(server.url + "info/refs") as resp:
            assert branch.encode() in resp.read()

        # ADVICE r7: only the dumb-protocol LAYOUT is served — the bare
        # repo's own config/hooks/description (and traversal attempts
        # into them) 404 instead of leaking over HTTP
        for leak in ("config", "hooks/", "description",
                     "objects/%2e%2e/config"):
            try:
                urllib.request.urlopen(server.url + leak)
                raise AssertionError(f"{leak} must not be served")
            except urllib.error.HTTPError as e:
                assert e.code == 404, leak
        with urllib.request.urlopen(server.url + "HEAD") as resp:
            assert resp.read().startswith(b"ref:")
    finally:
        server.stop()


def test_git_http_url_substitutes_routable_host_for_wildcard_bind(
    engine, group_src, tmp_path
):
    """ADVICE r7: binding to 0.0.0.0 must not produce the unconnectable
    http://0.0.0.0:port/ clone URL — the reported URL substitutes the
    machine hostname and stays fetchable."""
    import urllib.request

    backend = GitArtifactBackend(str(tmp_path / "vcs"))
    backend.commit_groups(group_src, task_desc="load")
    server = backend.serve_http(host="0.0.0.0")
    try:
        assert "0.0.0.0" not in server.url
        with urllib.request.urlopen(server.url + "info/refs") as resp:
            assert resp.status == 200
    finally:
        server.stop()
