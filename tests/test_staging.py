"""Protocol tests for the shared identity-keyed staging helper
(hadoop_pcap_spark/staging.py) — the contract bench.py and the layout/
streaming demo queries rely on for safe concurrent reuse."""

import os
import time

from hadoop_pcap_spark import staging


def _mk_src(tmp_path, name="src.parquet", content=b"x" * 100):
    p = tmp_path / name
    p.write_bytes(content)
    return str(p)


def test_key_tracks_source_identity(tmp_path):
    src = _mk_src(tmp_path)
    k1 = staging.source_key(src)
    # same content, same stat → same key
    assert staging.source_key(src) == k1
    # rewriting the file (new mtime_ns) must change the key, or a
    # regenerated table would silently serve the stale stage
    time.sleep(0.01)
    with open(src, "wb") as f:
        f.write(b"y" * 100)
    assert staging.source_key(src) != k1


def test_staged_dir_keeps_fresh_siblings_drops_idle(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        src = _mk_src(tmp_path)
        prefix = "stage_test_"
        fresh = tmp_path / (prefix + "freshkey")
        idle = tmp_path / (prefix + "idlekey")
        other = tmp_path / "other_prefix_dir"
        for d in (fresh, idle, other):
            d.mkdir()
        old = time.time() - 7200
        os.utime(idle, (old, old))

        d = staging.staged_dir(prefix, src)
        # a <1h-idle sibling (a CONCURRENT run's stage) survives
        assert fresh.exists()
        # a >1h-idle superseded sibling is reclaimed
        assert not idle.exists()
        # unrelated prefixes are never touched
        assert other.exists()
        assert not staging.is_complete(d)

        # reuse touches the kept dir so a long-running READER can't
        # go idle-stale under another process's cleanup
        os.makedirs(d, exist_ok=True)
        stale = time.time() - 7200
        os.utime(d, (stale, stale))
        staging.staged_dir(prefix, src)
        assert time.time() - os.stat(d).st_mtime < 60

        (tmp_path / os.path.basename(d) / "_SUCCESS").touch()
        assert staging.is_complete(d)
    finally:
        tempfile.tempdir = None
