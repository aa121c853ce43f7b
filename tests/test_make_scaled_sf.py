"""tools/make_scaled_sf.py invariants at K=3 over sf0.001.

The scaled dataset is the substrate for every above-sf0.1 claim in
SCALE.md, so the generator itself needs the same rigor as an
operator: row counts scale exactly K-fold, every foreign key still
resolves (a broken offset would silently turn scaled joins into
semi-empty results and make the sf1 oracle gate vacuous), and the
perturbations documented in the module docstring actually hold.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"
K = 3

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "make_scaled_sf.py",
)


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scaled_sf"))
    subprocess.run(
        [sys.executable, TOOL, "--src", SRC, "--out", out, "--k", str(K)],
        check=True,
        capture_output=True,
    )
    return out


@pytest.fixture(scope="module")
def con(scaled_dir):
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{scaled_dir}/{t}.parquet'")
        c.execute(f"CREATE VIEW base_{t} AS SELECT * FROM '{SRC}/{t}.parquet'")
    return c


def _count(con, t):
    return con.execute(f"SELECT count(*) FROM {t}").fetchone()[0]


def test_row_counts_scale_k_fold(con):
    for t in (
        "customer supplier part orders lineitem events documents embeddings"
    ).split():
        assert _count(con, t) == K * _count(con, f"base_{t}"), t
    for t in ("region", "nation"):
        assert _count(con, t) == _count(con, f"base_{t}"), t


def test_dims_copied_verbatim(con):
    for t, key in (("region", "r_regionkey"), ("nation", "n_nationkey")):
        diff = con.execute(
            f"SELECT count(*) FROM ((SELECT * FROM {t} EXCEPT "
            f"SELECT * FROM base_{t}) UNION ALL (SELECT * FROM base_{t} "
            f"EXCEPT SELECT * FROM {t}))"
        ).fetchone()[0]
        assert diff == 0, (t, key)


def test_referential_integrity(con):
    fks = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    for child, fk, parent, pk in fks:
        orphans = con.execute(
            f"SELECT count(*) FROM {child} c LEFT JOIN {parent} p "
            f"ON c.{fk} = p.{pk} WHERE p.{pk} IS NULL"
        ).fetchone()[0]
        assert orphans == 0, (child, fk)


def test_keys_stay_unique(con):
    for t, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {key}) FROM {t}"
        ).fetchone()
        assert n == d, (t, key)


def test_per_key_fanout_matches_base(con):
    """Each copy is a self-contained star: the lineitems-per-order
    histogram of the scaled data is exactly K x the base histogram."""
    rows = con.execute(
        f"""
        WITH s AS (SELECT mod(l_orderkey, (SELECT count(*) FROM base_orders))
                       AS k, count(*) AS n FROM lineitem GROUP BY 1),
             b AS (SELECT l_orderkey AS k, count(*) AS n
                   FROM base_lineitem GROUP BY 1)
        SELECT count(*) FROM s JOIN b USING (k) WHERE s.n <> b.n * {K}
        """
    ).fetchone()[0]
    assert rows == 0


def test_documents_text_perturbation(con):
    bad = con.execute(
        "SELECT count(*) FROM documents WHERE n_chars <> length(text)"
    ).fetchone()[0]
    assert bad == 0
    # exact dedup must see K distinct fingerprints per base doc
    n, d = con.execute(
        "SELECT count(*), count(DISTINCT md5(text)) FROM documents"
    ).fetchone()
    base_dup = con.execute(
        "SELECT count(*) - count(DISTINCT md5(text)) FROM base_documents"
    ).fetchone()[0]
    assert n - d == K * base_dup  # no new cross-copy exact dups


def test_embeddings_perturbed_but_close(con):
    n, d = con.execute(
        "SELECT count(*), count(DISTINCT embedding::VARCHAR) "
        "FROM embeddings"
    ).fetchone()
    base_n, base_d = con.execute(
        "SELECT count(*), count(DISTINCT embedding::VARCHAR) "
        "FROM base_embeddings"
    ).fetchone()
    # the constant per-copy shift keeps every copy distinct
    assert n - d == K * (base_n - base_d)
    # ...but within the same cosine neighborhood of its source vector
    nb = con.execute(
        """
        WITH j AS (
          SELECT b.embedding AS e0, s.embedding AS e1
          FROM base_embeddings b
          JOIN embeddings s
            ON s.vec_id = b.vec_id + (SELECT count(*) FROM base_embeddings)
        )
        SELECT min(list_cosine_similarity(e0, e1)) FROM j
        """
    ).fetchone()[0]
    assert nb > 0.95


def test_refuses_to_write_into_testdata():
    r = subprocess.run(
        [sys.executable, TOOL, "--src", SRC, "--out", "/root/testdata/x"],
        capture_output=True,
        text=True,
    )
    assert r.returncode != 0
    assert "refusing" in (r.stderr + r.stdout)
