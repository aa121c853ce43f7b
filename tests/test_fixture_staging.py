"""Fixture placement contract (plans/pcap_queries.py): default
per-process tempdir in local mode; SPARK_GRAFT_FIXTURE_DIR stages the
same fixtures into a shared directory, idempotently and atomically."""

import os

import pytest

from hadoop_pcap_spark.plans import pcap_queries as PQ


@pytest.fixture
def shared_root(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_DIR", str(tmp_path))
    saved = dict(PQ._ROOTS)
    PQ._ROOTS.clear()
    yield str(tmp_path)
    PQ._ROOTS.clear()
    PQ._ROOTS.update(saved)


def test_shared_dir_staging_and_idempotence(shared_root):
    d1 = PQ.fixture_dir()
    assert d1 == os.path.join(shared_root, "fixture")
    files = sorted(os.listdir(d1))
    assert files == ["a.pcap", "b.pcap.gz"]
    mtimes = {f: os.path.getmtime(os.path.join(d1, f)) for f in files}

    # second build: same dir, nothing rewritten, no leftover tmp files
    PQ._ROOTS.clear()
    d2 = PQ.fixture_dir()
    assert d2 == d1
    assert sorted(os.listdir(d1)) == files
    assert all(os.path.getmtime(os.path.join(d1, f)) == mtimes[f] for f in files)

    t = PQ.tcp_fixture_dir()
    assert t == os.path.join(shared_root, "tcp_fixture")
    assert os.listdir(t) == ["tcpdns.pcap"]


def test_default_mode_uses_process_tempdir(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_FIXTURE_DIR", raising=False)
    saved = dict(PQ._ROOTS)
    PQ._ROOTS.clear()
    try:
        d = PQ.fixture_dir()
        assert os.path.isdir(d) and "pcap_fixture_" in d
        assert sorted(os.listdir(d)) == ["a.pcap", "b.pcap.gz"]
    finally:
        PQ._ROOTS.clear()
        PQ._ROOTS.update(saved)


def test_shared_fixtures_decode_identically(spark, shared_root):
    """The staged bytes are the same capture the default path builds."""
    from hadoop_pcap_spark.sources import read_pcap

    n = read_pcap(spark, PQ.fixture_dir()).count()
    assert n == 4  # 2 packets × (plain + gz)
