"""Tests for dedup / similarity / multimodal operators beyond the
oracle harness (recall bounds, invariants, stub plumbing)."""

import os

import pytest

from pyspark.sql import Row, functions as F

from hadoop_pcap_spark.operators import dedup as DD
from hadoop_pcap_spark.operators import multimodal as MM
from hadoop_pcap_spark.operators import similarity as SIM
from hadoop_pcap_spark.functions import text as TXT

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [
        Row(doc_id=1, text="The quick brown fox"),
        Row(doc_id=2, text="the  quick   brown fox  "),  # same after norm
        Row(doc_id=3, text="something else entirely"),
    ]
    df = spark.createDataFrame(rows)
    groups = DD.exact_duplicates(df, TXT.exact_fingerprint(F.col("text"))).collect()
    assert len(groups) == 1
    assert groups[0].n_dupes == 2 and groups[0].keep_doc_id == 1
    kept = DD.dedup_exact(df, TXT.exact_fingerprint(F.col("text")))
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_minhash_lsh_finds_planted_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " lambda"),  # jaccard 10/11 ≈ 0.91
        Row(doc_id=3, text="totally different words here now ok yes"),
    ]
    df = spark.createDataFrame(rows)
    pairs = DD.minhash_lsh_pairs(df, threshold=0.5).collect()
    assert [(p.a, p.b) for p in pairs] == [(1, 2)]
    # 3-word shingles: doc1 has 8, doc2 has 9, 8 shared → 8/9
    assert pairs[0].jaccard == pytest.approx(8 / 9, abs=1e-4)


def test_minhash_lsh_superset_of_high_jaccard(spark, docs):
    """Every pair LSH finds must genuinely have jaccard >= threshold
    (verification guarantees precision = 1)."""
    out = DD.minhash_lsh_pairs(docs.limit(150), threshold=0.5)
    assert all(r.jaccard >= 0.5 for r in out.collect())


@pytest.mark.skipif(
    not os.path.isdir("/tmp/spark_graft_sf3"),
    reason="needs the sf3-equivalent corpus (tools/make_scaled_sf.py)",
)
def test_minhash_150k_low_memory():
    """The r5 memory-floor gate: 150k docs through the full
    minhash→LSH→verify pipeline on a deliberately undersized 1 GiB
    local[8] heap.  Before the int64 verify-array rework this OOM'd at
    any storage level (the sort-merge rows carried ~1 KB string
    shingle arrays; floor ~256 MB/core); the 60-bit hash image keeps
    the same oracle-matched result in ~3× less row width.  Subprocess:
    driver memory is fixed at JVM launch, so the shared session can't
    be resized."""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "from hadoop_pcap_spark.operators import dedup as DD, release_persisted\n"
        "spark = (SparkSession.builder.master('local[8]')\n"
        "    .config('spark.driver.memory', '1g')\n"
        # 16 partitions on 8 threads: each concurrent sort buffer
        # holds half the rows, halving the peak under the 1 GiB
        # ceiling — the all-8-maximal-sorts schedule was flaky under
        # CPU contention (passed alone, OOM'd ~50% inside full-suite
        # runs); the corpus size and heap stay the claim
        "    .config('spark.sql.shuffle.partitions', '16')\n"
        "    .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "docs = spark.read.parquet('/tmp/spark_graft_sf3/documents.parquet')\n"
        # DISK_ONLY is the documented knob for heaps where the cache
        # is a meaningful fraction of executor memory — on a 1 GiB
        # heap the MEMORY_AND_DISK int64 cache still occasionally
        # tipped a near-floor run over during spill re-reads
        "from pyspark import StorageLevel\n"
        "pairs = DD.minhash_lsh_pairs(docs, threshold=0.5,\n"
        "    storage_level=StorageLevel.DISK_ONLY)\n"
        "print('N_PAIRS=' + str(pairs.count()))\n"
        "release_persisted(pairs)\n"
    )
    # Two attempts: the gate sits deliberately close to the floor and
    # this host has heavy neighbor memory-bandwidth steal (BASELINE.md
    # noise model) — one retry separates "regressed past the floor"
    # (fails twice) from a transient squeeze (passes on retry).
    last = None
    for _ in range(2):
        r = subprocess.run(
            [_sys.executable, "-c", code], capture_output=True, text=True,
            timeout=540,
        )
        last = r
        if r.returncode == 0 and "N_PAIRS=" in r.stdout:
            break
    assert last.returncode == 0, f"1 GiB run failed twice:\n{last.stderr[-3000:]}"
    n = int(last.stdout.split("N_PAIRS=")[1].split()[0])
    assert n > 1_000_000  # sf3 planted dup families: 2.06M verified pairs


def test_simhash_identical_docs_zero_hamming(spark):
    rows = [
        Row(doc_id=1, text="one two three four five", lang="en"),
        Row(doc_id=2, text="five four three two one", lang="en"),  # same token set
        Row(doc_id=3, text="utterly different content words", lang="en"),
    ]
    df = spark.createDataFrame(rows)
    pairs = {(r.a, r.b): r.hamming for r in DD.simhash_near_pairs(df, 16, "lang").collect()}
    assert pairs[(1, 2)] == 0  # identical token sets → identical simhash


def test_simhash_banded_matches_bruteforce(spark, docs):
    """Pigeonhole banding loses NO pairs: banded candidates + verify ==
    all-pairs Hamming filter on the same 32-bit simhash."""
    sample = docs.limit(120)
    banded = {
        (r.a, r.b, r.hamming)
        for r in DD.simhash_banded_pairs(sample, max_hamming=3, bits=32).collect()
    }
    sh = DD.simhash_bits(DD.doc_tokens(sample), 32)
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r.a, r.b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_simhash_wide_banded_matches_bruteforce(spark, docs):
    """The 60-bit nibble-scheme variant keeps the pigeonhole
    guarantee: banded candidates + verify == all-pairs Hamming filter
    on the same wide simhash (zero recall loss at the 100 TB band
    width)."""
    sample = docs.limit(120)
    banded = {
        (r.a, r.b, r.hamming)
        for r in DD.simhash_banded_pairs(
            sample, max_hamming=3, bits=60, scheme="nibble"
        ).collect()
    }
    sh = DD.simhash_bits(DD.doc_tokens(sample), 60, scheme="nibble")
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r.a, r.b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute


def test_simhash_bits_scheme_validation(spark, docs):
    """parity caps at 32 bits, nibble at 62 (sign-bit safety);
    unknown schemes rejected."""
    tok = DD.doc_tokens(docs.limit(5))
    with pytest.raises(ValueError):
        DD.simhash_bits(tok, 33)
    with pytest.raises(ValueError):
        DD.simhash_bits(tok, 63, scheme="nibble")
    with pytest.raises(ValueError):
        DD.simhash_bits(tok, 16, scheme="xor")


def test_lsh_hot_bucket_guard_bounds_pairs(spark):
    """A 10k-copy cluster must not produce the m² clique: the guard
    short-circuits hot buckets to m−1 star pairs around the min doc_id,
    in bounded time."""
    import time

    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit(base).alias("text")
    )
    t0 = time.time()
    arrays = DD.doc_shingle_arrays(df, 3)
    sigs = DD.minhash_signatures_from_arrays(arrays)
    pairs = DD.candidate_pairs(DD.lsh_bands(sigs), max_bucket=64)
    n = pairs.count()
    elapsed = time.time() - t0
    # star pairs only: every doc pairs with anchor 0, once
    assert n == 9_999, n
    assert elapsed < 120, f"hot-bucket path took {elapsed:.0f}s"
    # and the guard leaves sub-cap buckets byte-identical
    small = spark.createDataFrame(
        [Row(doc_id=i, text=base + f" extra{i % 2}") for i in range(6)]
    )
    arrays2 = DD.doc_shingle_arrays(small, 3)
    sigs2 = DD.minhash_signatures_from_arrays(arrays2)
    bands2 = DD.lsh_bands(sigs2)
    guarded = {(r.a, r.b) for r in DD.candidate_pairs(bands2, max_bucket=64).collect()}
    unguarded = {(r.a, r.b) for r in DD.candidate_pairs(bands2, max_bucket=10**9).collect()}
    assert guarded == unguarded


def test_lsh_ann_recall_vs_bruteforce(spark):
    """Recall ≥0.8 at sf0.1 (2000 near-uniform random vectors — the
    hard case for hyperplane LSH; see cosine_topk_lsh docstring)."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    truth = {
        (r.q_id, r.n_id)
        for r in SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r.q_id, r.n_id) for r in SIM.cosine_topk_lsh(emb, q, k=5).collect()
    }
    recall = len(truth & approx) / len(truth)
    n_planes, probe_bits = 6, 3  # the cosine_topk_lsh defaults
    probe_frac = len(SIM._probe_masks(n_planes, probe_bits)) / 2 ** n_planes
    print(f"LSH recall={recall:.2f} probed bucket fraction={probe_frac:.2f}")
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_probe_masks_cover_requested_bits():
    """Round-2 bug: probe_bits=3 silently produced the 2-bit mask set."""
    m2 = SIM._probe_masks(6, 2)
    m3 = SIM._probe_masks(6, 3)
    assert len(m2) == 1 + 6 + 15
    assert len(m3) == 1 + 6 + 15 + 20
    assert all(bin(m).count("1") <= 3 for m in m3)
    assert len(set(m3)) == len(m3)


def test_bruteforce_topk_selfconsistency(spark, emb):
    out = SIM.cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=3)
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert rows[0].cos >= rows[1].cos >= rows[2].cos
    assert all(r.n_id != 0 for r in rows)
    assert all(-1.0 <= r.cos <= 1.0 for r in rows)


def test_approx_count_distinct_error_bound(spark):
    from hadoop_pcap_spark.plans import events_table

    ev = events_table(spark, SF)  # events.parquet is TIMESTAMP_NS → µs longs
    got = dict(
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
        .collect()
    )
    exact = dict(
        ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("e")).collect()
    )
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.05, (k, got[k], e)


def test_multimodal_image_features(spark):
    rows = [
        Row(media_id=1, content=b"\xff\xd8\xff\xe0" + b"x" * 100),
        Row(media_id=2, content=b"\x89PNG\r\n" + b"y" * 50),
        Row(media_id=3, content=b""),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in MM.image_features(df).collect()}
    assert out[1].format_guess == "jpeg" and out[2].format_guess == "png"
    assert out[1].width >= 16 and out[1].height >= 16
    assert out[3].width is None  # empty buffer → decode failure → nulls
    assert out[1].n_bytes == 104
    # deterministic stub: same bytes → same dims
    again = {r.media_id: r for r in MM.image_features(df).collect()}
    assert again[1].width == out[1].width


def test_multimodal_frame_sampling(spark):
    rows = [Row(media_id=1, content=bytes(range(256)) * 20)]  # 5120 bytes
    df = spark.createDataFrame(rows, "media_id long, content binary")
    frames = MM.sample_frames(df, every_n_bytes=1024).collect()
    assert len(frames) == 5
    assert [f.frame_no for f in sorted(frames, key=lambda r: r.frame_no)] == list(range(5))


def test_connected_components_clusters(spark):
    from pyspark.sql import Row
    from hadoop_pcap_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=10, b=11), Row(a=3, b=4)]
    )
    labels = {r.doc_id: r.component for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_chain_convergence(spark):
    """A long chain exercises multi-iteration propagation."""
    from pyspark.sql import Row
    from hadoop_pcap_spark.operators.dedup import connected_components

    n = 20
    edges = spark.createDataFrame([Row(a=i, b=i + 1) for i in range(n)])
    labels = {r.doc_id: r.component for r in connected_components(edges, max_iter=30).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == n + 1


def test_connected_components_deep_chain_pointer_jumping(spark):
    """Adversarial deep chain (diameter 96 — the chained-near-dup
    family VERDICT r12 flagged): with hop-only propagation the default
    iteration budget would exhaust and, pre-fix, return silently-wrong
    labels; pointer jumping must converge it within the DEFAULT
    max_iter (distance covered ~doubles per round, so ⌈log2(96)⌉+slack
    ≤ 12 rounds)."""
    from pyspark.sql import Row
    from hadoop_pcap_spark.operators.dedup import connected_components

    n = 96
    edges = spark.createDataFrame([Row(a=i, b=i + 1) for i in range(n)])
    labels = {
        r.doc_id: r.component for r in connected_components(edges).collect()
    }
    assert set(labels.values()) == {0}
    assert len(labels) == n + 1


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter must RAISE, never return partial labels —
    silently-unconverged components would let docs_leakage_safe_split
    put one dup cluster on both sides of a train/eval boundary
    (VERDICT r12 'What's wrong')."""
    import pytest
    from pyspark.sql import Row
    from hadoop_pcap_spark.operators.dedup import connected_components

    # diameter 40 chain; 2 hop+jump rounds cover distance ~2^2 only
    edges = spark.createDataFrame([Row(a=i, b=i + 1) for i in range(40)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_salted_join_equivalence(spark):
    """Salted join must be row-identical to the plain join while
    spreading hot keys over n_salts reducers."""
    from hadoop_pcap_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_partkey", "l_quantity")
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey").groupBy("p_brand").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, part, "l_partkey", n_salts=8).groupBy("p_brand").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    a = {r.p_brand: (r.n, r.q) for r in plain.collect()}
    b = {r.p_brand: (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_two_phase_agg_equivalence(spark):
    from hadoop_pcap_spark.operators.skew import two_phase_agg

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = {
        r.l_returnflag: (r.n, round(r.total, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("total"))
        .collect()
    }
    two = {
        r.l_returnflag: (r.n, round(r.total, 2))
        for r in two_phase_agg(li, "l_returnflag", "l_quantity").collect()
    }
    assert plain == two


def test_two_phase_agg_spreads_constant_hot_key(spark):
    """The classic skew case: one hot key whose agg values are all
    constant.  The salt must still spread the key ~n_salts ways
    (a value-derived salt silently no-ops here)."""
    from hadoop_pcap_spark.operators.skew import two_phase_agg

    df = spark.range(80_000).select(
        F.lit("hot").alias("k"), F.lit(1.0).alias("v")
    )
    n_salts = 8
    partial = df.withColumn(
        "_salt", F.monotonically_increasing_id() % n_salts
    ).groupBy("k", "_salt").count()
    assert partial.count() == n_salts  # hot key spread over all salts
    out = two_phase_agg(df, "k", "v", n_salts=n_salts).collect()
    assert len(out) == 1 and out[0].n == 80_000 and out[0].total == 80_000.0


def test_salted_join_rejects_right_full(spark):
    from hadoop_pcap_spark.operators.skew import salted_join

    df = spark.createDataFrame([Row(k=1, v=2)])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(df, df, "k", how=how)


def test_ivf_ann_recall_and_bound(spark):
    """IVF ANN at the defaults (32 cells, 12 probed, trained on the
    full sf0.1 corpus): recall ≥0.8 while probing 38% of cells —
    locality-aware cells beat the probed fraction by a wide margin."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    truth = {
        (r.q_id, r.n_id) for r in SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    got = SIM.cosine_topk_ivf(emb, q, k=5).collect()
    approx = {(r.q_id, r.n_id) for r in got}
    recall = len(truth & approx) / len(truth)
    print(f"IVF recall={recall:.2f} probed cell fraction={12 / 32:.2f}")
    assert recall >= 0.8, f"IVF recall too low: {recall}"
    # per-query output is a valid ranked top-k
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, []).append(r)
    for q_id, rows in per_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_net_functions(spark):
    from pyspark.sql import Row
    from hadoop_pcap_spark.functions import net as NET

    rows = [
        Row(ip="10.1.2.3"), Row(ip="192.168.0.1"), Row(ip="172.16.5.5"),
        Row(ip="8.8.8.8"), Row(ip="not-an-ip"), Row(ip="256.1.2.3"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.ip: (r.num, r.priv, r.pfx)
        for r in df.select(
            "ip",
            NET.ipv4_to_long(F.col("ip")).alias("num"),
            NET.is_private_ipv4(F.col("ip")).alias("priv"),
            NET.ipv4_prefix(F.col("ip"), 24).alias("pfx"),
        ).collect()
    }
    assert out["10.1.2.3"] == (167838211, True, "10.1.2.0/24")
    assert out["8.8.8.8"][1] is False and out["8.8.8.8"][2] == "8.8.8.0/24"
    assert out["192.168.0.1"][1] is True and out["172.16.5.5"][1] is True
    assert out["not-an-ip"][0] is None
    # regex accepts 256 octets (documented: format check, not range) —
    # numeric form still computes; callers needing strict validity
    # should range-check octets
    assert out["256.1.2.3"][0] is not None


def test_multimodal_audio_features(spark):
    from pyspark.sql import Row
    from hadoop_pcap_spark.operators import multimodal as MM2

    rows = [
        Row(media_id=1, content=b"RIFF" + b"\x00" * 60),
        Row(media_id=2, content=b"fLaC" + b"\x01" * 30),
        Row(media_id=3, content=b""),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in MM2.audio_features(df).collect()}
    assert out[1].format_guess == "wav" and out[2].format_guess == "flac"
    assert out[1].duration_ms >= 100 and out[1].sample_rate in (8000, 16000, 22050, 44100, 48000)
    assert out[3].duration_ms is None


def test_multimodal_real_header_parsers(spark):
    """Known container formats decode REAL metadata via the pure-Python
    header parsers (PIL/soundfile path takes over when importable);
    unknown bytes keep the deterministic stub."""
    import struct as _s

    png = (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR"
           + _s.pack(">IIBBBBB", 640, 480, 8, 2, 0, 0, 0) + b"\x00" * 4)
    gif = b"GIF89a" + _s.pack("<HH", 320, 200) + b"\x00" * 20
    # JPEG: SOI, APP0 (len 4), SOF0 with h=99 w=77
    jpeg = (b"\xff\xd8" + b"\xff\xe0" + _s.pack(">H", 4) + b"JF"
            + b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", 99, 77)
            + b"\x03" + b"\xff\xd9")
    bmp = b"BM" + b"\x00" * 16 + _s.pack("<ii", 123, -45) + b"\x00" * 20
    rows = [
        Row(media_id=1, content=png),
        Row(media_id=2, content=gif),
        Row(media_id=3, content=jpeg),
        Row(media_id=4, content=bmp),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in MM.image_features(df).collect()}
    assert (out[1].width, out[1].height) == (640, 480)
    assert (out[2].width, out[2].height) == (320, 200)
    assert (out[3].width, out[3].height) == (77, 99)
    assert (out[4].width, out[4].height) == (123, 45)  # top-down DIB

    # WAV: 16-bit mono 8kHz, 1600 data bytes -> 100 ms
    fmt = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (b"RIFF" + _s.pack("<I", 36 + 1600) + b"WAVE"
           + b"fmt " + _s.pack("<I", 16) + fmt
           + b"data" + _s.pack("<I", 1600) + b"\x00" * 1600)
    adf = spark.createDataFrame([Row(media_id=1, content=wav)],
                                "media_id long, content binary")
    a = MM.audio_features(adf).collect()[0]
    assert (a.duration_ms, a.sample_rate) == (100, 8000)
    assert a.format_guess == "wav"


def test_multimodal_decoder_fallback_order():
    """Dispatcher unit checks: header parse beats stub; stub handles
    unknown; real-codec path is import-guarded (absent here)."""
    from hadoop_pcap_spark.operators.multimodal import (
        _decode_audio, _decode_image, _parse_image_dims, _parse_wav)

    assert _parse_image_dims(b"garbage") is None
    assert _parse_wav(b"RIFF\x00\x00\x00\x00JUNK") is None
    w, h = _decode_image(b"not-an-image-at-all")
    assert 16 <= w < 2064 and 16 <= h < 2064  # deterministic stub range
    assert _decode_image(b"not-an-image-at-all") == (w, h)
    d, r = _decode_audio(b"not-audio")
    assert d >= 100 and r in (8000, 16000, 22050, 44100, 48000)


def test_embedding_near_dup(spark):
    """Vector near-dup: candidates only from shared sign bands, exact
    cosine verify, a<b, and full agreement with a brute-force check
    restricted to band-sharing pairs."""
    import itertools
    import math
    import random

    from hadoop_pcap_spark.operators import similarity as SIM2

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(32)]
    vecs = []
    for i in range(30):
        if i % 3 == 0:  # near-copies of base → true near-dups
            v = [x + rng.uniform(-0.05, 0.05) for x in base]
        else:
            v = [rng.uniform(-1, 1) for _ in range(32)]
        vecs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {(r.a, r.b): r.cos
           for r in SIM2.embedding_near_dup(df, threshold=0.9).collect()}
    assert all(a < b for a, b in got)
    assert all(c >= 0.9 for c in got.values())

    # brute-force reference, restricted to pairs sharing >=1 sign band
    def f32(x):
        import struct as _s
        return _s.unpack("f", _s.pack("f", x))[0]

    emb = {i: [f32(x) for x in v] for i, v in vecs}

    def bandsig(v, b):
        return tuple(x >= 0 for x in v[b * 8:(b + 1) * 8])

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        return d / (math.sqrt(sum(x * x for x in u)) * math.sqrt(sum(y * y for y in v)))

    want = set()
    for a, b in itertools.combinations(sorted(emb), 2):
        shares = any(bandsig(emb[a], k) == bandsig(emb[b], k) for k in range(4))
        if shares and cos(emb[a], emb[b]) >= 0.9 - 1e-9:
            want.add((a, b))
    assert set(got) == want and len(want) >= 10


def _persistent_rdd_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_release_persisted_unpersists_minhash_cache(spark, docs):
    from hadoop_pcap_spark.operators import release_persisted

    before = _persistent_rdd_ids(spark)
    pairs = DD.minhash_lsh_pairs(docs.limit(60), threshold=0.5)
    pairs.count()  # materialize → shingle-array cache is live
    assert _persistent_rdd_ids(spark) - before, "expected a registered cache"
    release_persisted(pairs, blocking=True)
    assert _persistent_rdd_ids(spark) - before == set()


def test_corpus_keep_set_planted_corpus(spark):
    """Planted exact + near dups: the decision table keeps exactly one
    representative (min id) per duplicate family."""
    near_a = "the quick brown fox jumps over the lazy dog again and again today"
    near_b = near_a.replace("today", "tonight")  # high shingle overlap
    rows = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=2, text="  Alpha beta   GAMMA delta epsilon zeta "),  # exact dup of 1
        Row(doc_id=3, text=near_a),
        Row(doc_id=4, text=near_b),  # near dup of 3
        Row(doc_id=5, text="completely unrelated content about spark engines"),
    ]
    out = {
        r.doc_id: r
        for r in DD.corpus_keep_set(spark.createDataFrame(rows), threshold=0.5).collect()
    }
    assert len(out) == 5
    assert (out[1].kept, out[1].reason, out[1].rep) == (True, "kept", 1)
    assert (out[2].kept, out[2].reason, out[2].rep) == (False, "exact_dup", 1)
    assert (out[3].kept, out[3].reason, out[3].rep) == (True, "kept", 3)
    assert (out[4].kept, out[4].reason, out[4].rep) == (False, "near_dup", 3)
    assert (out[5].kept, out[5].reason, out[5].rep) == (True, "kept", 5)


def test_dedup_corpus_parquet_write_roundtrip(spark, tmp_path):
    """The materialization path: write the deduped corpus to parquet
    and read it back — full-width rows, keep set only."""
    from hadoop_pcap_spark.operators import released

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    before = _persistent_rdd_ids(spark)
    path = str(tmp_path / "deduped")
    with released(DD.dedup_corpus(docs, threshold=0.5), blocking=True) as kept:
        kept.write.parquet(path)
    assert _persistent_rdd_ids(spark) - before == set()

    back = spark.read.parquet(path)
    assert back.columns == docs.columns  # full width preserved
    decisions = DD.corpus_keep_set(docs, threshold=0.5)
    want = {r.doc_id for r in decisions.filter("kept").collect()}
    got = {r.doc_id for r in back.select("doc_id").collect()}
    assert got == want and 0 < len(got) < docs.count()


def test_release_persisted_unpersists_embedding_cache(spark, emb):
    from hadoop_pcap_spark.operators import released

    before = _persistent_rdd_ids(spark)
    with released(SIM.embedding_near_dup(emb, threshold=0.35), blocking=True) as pairs:
        pairs.count()
        assert _persistent_rdd_ids(spark) - before
    assert _persistent_rdd_ids(spark) - before == set()


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_hot_bucket_guard_headroom_at_validation_sfs(spark, sf):
    """ADVICE r2: the star guard (max_bucket) is NOT modeled by the
    DuckDB oracles — they build the full per-bucket clique.  The
    oracle gate is therefore only sound while no bucket exceeds the
    cap at any validation SF.  Pin that: observed max bucket size must
    keep clear headroom under the cap for both the minhash-LSH and
    sign-band (embedding) bucket spaces, at every SF the driver or
    bench touches."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sigs = DD.minhash_signatures_from_arrays(DD.doc_shingle_arrays(docs, 3))
    biggest = (
        DD.lsh_bands(sigs)
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert biggest <= 64 // 2, f"minhash bucket {biggest} within 2x of the cap"

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec")
    )
    biggest_sb = (
        SIM.sign_bands(emb)
        .groupBy("band", "key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert biggest_sb <= 4096 // 2, f"sign-band bucket {biggest_sb} within 2x of cap"


# --- contamination detection ---------------------------------------------------


def test_ngram_contamination_plants_and_finds(spark):
    from pyspark.sql import Row

    from hadoop_pcap_spark.operators.contamination import ngram_contamination

    bench = spark.createDataFrame(
        [Row(doc_id=1000, text="the secret benchmark answer is forty two exactly")]
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "secret benchmark answer is forty"
            Row(doc_id=1, text="copied: the secret benchmark answer is forty two"),
            Row(doc_id=2, text="clean text about sparks and rivers flowing home"),
            # shares words but no 5-gram run
            Row(doc_id=3, text="benchmark the answer secret forty is two the"),
        ]
    )
    out = {r.doc_id: r for r in ngram_contamination(corpus, bench, k=5).collect()}
    assert set(out) == {1}
    assert out[1].n_hit_shingles >= 3  # overlapping window of 5-grams
    assert out[1].n_bench_docs == 1
    assert 0 < out[1].contamination <= 1


def test_ngram_contamination_short_docs_whole_text(spark):
    """Docs shorter than k fall back to whole-text shingles — an exact
    short-text match is caught, a different short text is not."""
    from pyspark.sql import Row

    from hadoop_pcap_spark.operators.contamination import ngram_contamination

    bench = spark.createDataFrame([Row(doc_id=9, text="tiny eval prompt")])
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="tiny eval prompt"), Row(doc_id=2, text="other words")]
    )
    out = [r.doc_id for r in ngram_contamination(corpus, bench, k=5).collect()]
    assert out == [1]


def test_ngram_contamination_broadcasts_benchmark(spark):
    from hadoop_pcap_spark.operators.contamination import ngram_contamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        ngram_contamination(
            docs.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_multimodal_resize_policy(spark):
    """Resize plumbing: aspect-preserving fit, never upscaling; with
    no codec importable the bytes pass through but target dims are
    computed from the parsed header."""
    import struct

    def png(w, h):
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            + b"\x00" * 16
        )

    rows = [
        Row(media_id=1, content=png(1024, 512)),
        Row(media_id=2, content=png(100, 50)),   # already fits
        Row(media_id=3, content=b""),            # undecodable
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in MM.resize_images(df, max_dim=256).collect()}
    assert (out[1].src_width, out[1].src_height) == (1024, 512)
    assert (out[1].width, out[1].height) == (256, 128)
    assert (out[2].width, out[2].height) == (100, 50)  # no upscale
    assert out[3].width is None and out[3].resized is False
    # pure-fit policy is codec-independent
    assert MM._fit_dims(512, 1024, 256) == (128, 256)
    assert MM._fit_dims(10000, 3, 256) == (256, 1)


def test_image_pixel_stats_real_codec(spark):
    """The stdlib PNG decoder inverts every RFC 2083 filter type and
    the decoded pixel sums equal the synthesis formula's; undecodable
    blobs yield NULLs.  Where PIL is importable the C path must agree
    bit-for-bit (lossless format)."""
    from hadoop_pcap_spark.operators.multimodal import (
        _png_decode_rgb,
        image_pixel_stats,
    )
    from hadoop_pcap_spark.plans.media_queries import (
        _px,
        _png_real,
        real_media_blobs,
    )

    # kernel-level: decode one PNG and compare every pixel (not just
    # sums) against the formula — the strongest unfilter check
    w, h, seed = (13, 11, 42)
    out = _png_decode_rgb(_png_real(w, h, seed))
    assert out is not None
    dw, dh, rows = out
    assert (dw, dh) == (w, h)
    for y, line in enumerate(rows):
        for x in range(w):
            assert tuple(line[3 * x : 3 * x + 3]) == _px(x, y, seed), (x, y)

    # operator-level over the full fixture: sums match intent, NULLs
    # where intent says undecodable
    df = spark.createDataFrame(
        [(mid, blob) for mid, blob, _, _ in real_media_blobs()],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in image_pixel_stats(df).collect()}
    for mid, _, img, _ in real_media_blobs():
        r = got[mid]
        assert (r.width, r.height, r.n_px, r.sum_r, r.sum_g, r.sum_b) == (
            img["width"], img["height"], img["n_px"],
            img["sum_r"], img["sum_g"], img["sum_b"],
        ), mid
    try:
        import io

        import numpy as np
        import PIL.Image
    except ImportError:
        return  # stdlib path already asserted; PIL parity where present
    arr = np.asarray(
        PIL.Image.open(io.BytesIO(_png_real(w, h, seed))).convert("RGB")
    )
    for y in range(h):
        for x in range(w):
            assert tuple(int(v) for v in arr[y, x]) == _px(x, y, seed)


def test_audio_pcm_stats_real_codec(spark):
    """The stdlib wave codec decodes genuine 16-bit PCM and the
    absolute-sample sums equal the synthesis formula's; truncated /
    foreign / empty blobs yield NULLs."""
    from hadoop_pcap_spark.operators.multimodal import audio_pcm_stats
    from hadoop_pcap_spark.plans.media_queries import real_media_blobs

    df = spark.createDataFrame(
        [(mid, blob) for mid, blob, _, _ in real_media_blobs()],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    for mid, _, _, aud in real_media_blobs():
        r = got[mid]
        assert (
            r.sample_rate, r.n_channels, r.n_frames, r.duration_ms, r.sum_abs
        ) == (
            aud["sample_rate"], aud["n_channels"], aud["n_frames"],
            aud["duration_ms"], aud["sum_abs"],
        ), mid


def test_approx_percentiles_error_bound(spark):
    """GK sketch at accuracy=1000: the approximate median/p90 must sit
    within the value range of ranks ±0.5% around the target rank.
    The registered query emits exactly that verdict per group (bound
    contract, r10) — every boolean must come back true — and the raw
    sketch value is re-checked here against an independently sorted
    exact rank window so the contract itself stays honest."""
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["approx_percentiles_sketch"](spark, sf).collect()
    assert rows and all(r.qty_in_bound and r.price_in_bound for r in rows), rows
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.l_returnflag: r.median_qty
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_quantity", 0.5, 1000).alias("median_qty"))
        .collect()
    }
    for flag, median_qty in got.items():
        vals = sorted(
            r.l_quantity for r in li.filter(F.col("l_returnflag") == flag).collect()
        )
        n = len(vals)
        lo, hi = vals[max(0, int(0.495 * n))], vals[min(n - 1, int(0.505 * n))]
        assert lo <= median_qty <= hi, (flag, median_qty, lo, hi)


def test_frequent_items_superset_of_true_heavy_hitters(spark):
    """Every key with true frequency > support·n must appear in the
    sketch output (the one-sided space-saving guarantee).  The
    registered query emits one row per TRUE heavy hitter with its
    membership verdict (bound contract, r10) — the row set must match
    an independent exact computation and every verdict must be true."""
    from hadoop_pcap_spark.plans import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.01"
    out = QUERIES["frequent_items_sketch"](spark, sf).collect()
    assert out and all(r.present for r in out), out
    ev = spark.read.parquet(f"{sf}/events.parquet")
    total = ev.count()
    true_heavy = {
        ("event_type", r.event_type)
        for r in ev.groupBy("event_type").count().collect()
        if r["count"] > 0.05 * total
    } | {
        ("user_id", str(r.user_id))
        for r in ev.groupBy("user_id").count().collect()
        if r["count"] > 0.05 * total
    }
    assert {(r.col, r.item) for r in out} == true_heavy


def test_corpus_shards_roundtrip_and_deterministic_manifest(spark, tmp_path):
    """Shard writer: every doc lands in exactly one shard, shard
    membership is stable across runs/partitionings, and two builds of
    the same corpus produce identical manifests."""
    from hadoop_pcap_spark.operators.shards import (
        shard_manifest,
        write_corpus_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = str(tmp_path / "corpus")
    m1 = {r.shard: r for r in write_corpus_shards(docs, out, n_shards=8).collect()}
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert set(m1) == set(range(8))
    assert sum(r.n_docs for r in m1.values()) == docs.count()
    # rebuild from a different partitioning → identical manifest
    from hadoop_pcap_spark.operators.shards import assign_shards

    m2 = {
        r.shard: r
        for r in shard_manifest(assign_shards(docs.repartition(13), 8)).collect()
    }
    assert {k: (v.n_docs, v.content_digest) for k, v in m1.items()} == {
        k: (v.n_docs, v.content_digest) for k, v in m2.items()
    }
    # and the persisted manifest matches the returned one
    stored = {r.shard: r for r in spark.read.parquet(f"{out}/_manifest").collect()}
    assert {k: v.content_digest for k, v in stored.items()} == {
        k: v.content_digest for k, v in m1.items()
    }


def test_leakage_safe_split_no_cluster_straddles(spark):
    """The defining property: no dup-cluster may have members on both
    sides of the split (planted exact + near dups must follow their
    cluster)."""
    import tempfile, os

    from hadoop_pcap_spark.plans import QUERIES, load_all
    from hadoop_pcap_spark.operators.dedup import corpus_keep_set

    load_all()
    base = "the quick brown foxes jump over the lazy dogs near the old barn today"
    rows = [Row(doc_id=i, source="s", text=f"{base} unique{i} tail{i}") for i in range(40)]
    rows += [Row(doc_id=100 + i, source="s", text=base) for i in range(6)]  # exact dups
    rows += [Row(doc_id=200 + i, source="s", text=base + f" extra{i % 2}") for i in range(4)]
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(rows)
        df.write.parquet(os.path.join(d, "documents.parquet"))
        # recompute the per-doc side the query aggregates, then check
        # cluster purity directly
        decisions = corpus_keep_set(spark.read.parquet(os.path.join(d, "documents.parquet")))
        reps = {r.doc_id: r.rep for r in decisions.collect()}
        cluster = {d_: min(reps.get(reps[d_], reps[d_]), reps[d_]) for d_ in reps}
        import hashlib

        side = {
            d_: ("eval" if hashlib.md5(str(c).encode()).hexdigest()[:8] < "40000000" else "train")
            for d_, c in cluster.items()
        }
        by_cluster = {}
        for d_, c in cluster.items():
            by_cluster.setdefault(c, set()).add(side[d_])
        assert all(len(sides) == 1 for sides in by_cluster.values())
        # and the registered query agrees on totals
        got = QUERIES["docs_leakage_safe_split"](spark, d).collect()
        assert sum(r.n_docs for r in got) == len(rows)


def test_minhash_n_hashes_bounded(spark):
    """The a + i*b md5-halves family wraps int64 for i >= 8, silently
    diverging from the DuckDB oracle — n_hashes > 8 must raise, not
    wrap (ADVICE r3)."""
    tok = spark.createDataFrame([(1, "tok")], ["doc_id", "token"])
    arrays = spark.createDataFrame([(1, ["tok"])], ["doc_id", "arr"])
    for bad in (0, 9, 16):
        with pytest.raises(ValueError, match="n_hashes"):
            DD.minhash_signatures(tok, n_hashes=bad)
        with pytest.raises(ValueError, match="n_hashes"):
            DD.minhash_signatures_from_arrays(arrays, n_hashes=bad)
    # the full legal range still works
    assert DD.minhash_signatures(tok, n_hashes=8).columns == [
        "doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7",
    ]


def test_checkpoint_release_version_guard(spark):
    """The eager checkpoint release rides on private Spark internals;
    it must (a) work on the session's own Spark version — which must be
    inside the verified range — and (b) degrade to a warning no-op on
    an unverified version (VERDICT r3 watch-list)."""
    import warnings

    import pyspark

    from hadoop_pcap_spark.operators import cache as C

    # (a) this session's version is verified and the probe finds the RDD
    assert C._checkpoint_api_supported(pyspark.__version__)
    df = spark.range(10).localCheckpoint()
    jrdd = C._checkpoint_jrdd(df)
    assert jrdd is not None  # private API works on this Spark
    C.release_checkpoint(df)

    # (b) unverified versions: no-op + one-time RuntimeWarning
    for v in ("5.0.0", "2.4.8", "unknown"):
        assert not C._checkpoint_api_supported(v)
    orig = pyspark.__version__
    try:
        pyspark.__version__ = "99.0.0"
        C._warned_versions.discard("99.0.0")
        df2 = spark.range(5).localCheckpoint()
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert C._checkpoint_jrdd(df2) is None
        assert any("99.0.0" in str(w.message) for w in rec)
        with warnings.catch_warnings(record=True) as rec2:
            warnings.simplefilter("always")
            assert C._checkpoint_jrdd(df2) is None  # warns only once
        assert not rec2
    finally:
        pyspark.__version__ = orig


def test_rp_band_near_dup_recall_at_production_threshold(spark):
    """VERDICT r3 item 5: random-projection sign bands must recover
    >=90% of true cosine->=0.9 pairs on a corpus with planted
    near-dups (defaults predict ~0.98 analytically)."""
    import numpy as np

    from hadoop_pcap_spark.operators import similarity as SIM
    from hadoop_pcap_spark.operators.cache import release_persisted

    rng = np.random.default_rng(7)
    dim = 64
    base = rng.normal(size=(250, dim))
    rows = []
    truth = set()
    vid = 0
    ids_of = {}
    for b in range(len(base)):
        v = base[b] / np.linalg.norm(base[b])
        rows.append((vid, [float(x) for x in v]))
        ids_of[b] = vid
        vid += 1
    # plant 1-2 perturbed twins per first-120 base vector at cos .92-.99
    planted_vecs = {i: base[i] / np.linalg.norm(base[i]) for i in range(len(base))}
    for b in range(120):
        for _ in range(1 + (b % 2)):
            eps = rng.normal(size=dim)
            eps /= np.linalg.norm(eps)
            t = 0.15 + 0.25 * rng.random()  # cos in ~[.92, .99]
            v = planted_vecs[b] + t * eps
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            planted_vecs[vid] = v  # may pair with siblings too
            vid += 1
    # brute-force ground truth over ALL rows
    M = np.array([r[1] for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    cos = M @ M.T
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            if round(cos[i, j], 6) >= 0.9:
                truth.add((rows[i][0], rows[j][0]))
    assert len(truth) >= 100  # the plant worked

    emb = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<double>"
    )
    out = SIM.embedding_near_dup_rp(emb, threshold=0.9, dim=dim)
    got = {(r.a, r.b) for r in out.collect()}
    release_persisted(out)
    assert not (got - truth)  # verification is exact: no false pairs
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth))


def test_corpus_boilerplate_flags_planted_phrase(spark):
    """corpus_boilerplate: a fixed 8-word phrase planted in 4 of 8
    docs is flagged (df >= min_docs); unique docs get n_boiler = 0;
    the short-doc whole-text fallback shingle counts too."""
    from hadoop_pcap_spark.operators.contamination import corpus_boilerplate

    phrase = "all rights reserved contact the site admin team"
    rows = [
        (i, f"{phrase} {i} unique tail words alpha beta gamma delta")
        for i in range(4)
    ] + [
        (10 + i, " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(3)
    ] + [(99, "tiny doc")]  # < 8 tokens → whole text is the one shingle
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_shingles, r.n_boiler)
        for r in corpus_boilerplate(docs, k=8, min_docs=3).collect()
    }
    # every planted doc: the phrase contributes exactly one shared
    # 8-shingle (the tails diverge at word 9 via the doc number)
    for i in range(4):
        assert out[i][1] == 1, out[i]
    for i in range(3):
        assert out[10 + i][1] == 0, out[10 + i]
    assert out[99] == (1, 0)
    # fractions are consistent
    full = corpus_boilerplate(docs, k=8, min_docs=3).collect()
    for r in full:
        assert abs(r.boiler_frac - round(r.n_boiler / r.n_shingles, 6)) < 1e-9


def test_corpus_boilerplate_matches_bruteforce_reference(spark):
    """Property check on a randomized-but-seeded corpus: per-doc
    (n_shingles, n_boiler) must equal a brute-force Python reference
    of the same contract (distinct k-shingles, df >= min_docs)."""
    import random
    import re

    rng = random.Random(20260815)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab → real collisions
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 20))))
        for i in range(40)
    ]
    k, min_docs = 3, 3

    def shingles(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sets = {i: shingles(t) for i, t in rows}
    df_count = {}
    for s in sets.values():
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    boiler = {g for g, n in df_count.items() if n >= min_docs}
    expect = {
        i: (len(s), sum(1 for g in s if g in boiler)) for i, s in sets.items()
    }

    from hadoop_pcap_spark.operators.contamination import corpus_boilerplate

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shingles, r.n_boiler)
        for r in corpus_boilerplate(docs, k=k, min_docs=min_docs).collect()
    }
    assert got == expect
    assert any(v[1] > 0 for v in expect.values())  # the check has teeth


def test_zorder_write_lossless_and_prunes(spark, tmp_path):
    """write_zordered preserves the row multiset, and the z-layout's
    row-group stats prune a box predicate on BOTH dimensions — in
    particular on the SECOND dimension alone, where a 1-D sort prunes
    nothing (the property z-ordering exists to buy)."""
    from pyspark.sql import functions as F

    from hadoop_pcap_spark.operators.layout import (
        rowgroup_prune_stats,
        write_zordered,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    # 16 files, not 8: the range partitioner's reservoir sample is
    # seeded by rdd.id, so file boundaries jitter with test ORDER; at
    # 8 files the z-vs-linear box margin was zero (6 vs 5-6 skippable)
    # and an unlucky boundary could flip the comparison, while at 16
    # the z advantage is structural (13 vs 11-12 across seed churn)
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], bits=8, n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )
    z = spark.read.parquet(zdir)
    # lossless: same row multiset (count + exact sum + an
    # order-insensitive whole-row hash sum)
    agg = lambda d: d.agg(  # noqa: E731
        F.count("*"),
        F.sum("l_quantity"),
        F.sum(F.hash("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")),
    ).first()
    assert agg(z) == agg(li)

    sk_hi = li.agg(F.max("l_suppkey")).first()[0] * 0.25
    second_dim = {"l_suppkey": (0.0, sk_hi)}
    z_stats = rowgroup_prune_stats(zdir, second_dim)
    l_stats = rowgroup_prune_stats(ldir, second_dim)
    # 1-D partkey sort leaves suppkey full-range per file: 0 skipped
    assert l_stats["skippable"] == 0
    # the z-layout must actually skip on the second dimension
    assert z_stats["skippable"] >= z_stats["row_groups"] // 2

    pk_hi = li.agg(F.max("l_partkey")).first()[0] * 0.25
    box = {"l_partkey": (0.0, pk_hi), "l_suppkey": (0.0, sk_hi)}
    assert (
        rowgroup_prune_stats(zdir, box)["skippable"]
        >= rowgroup_prune_stats(ldir, box)["skippable"]
    )


def test_zorder_key_constant_and_null_columns(spark):
    """Degenerate inputs must not break the key: a constant column
    collapses to bucket 0 (valid bounds via the widened max), and a
    NULL value yields a NULL key — rows cluster together rather than
    erroring."""
    from pyspark.sql import Row

    from hadoop_pcap_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [Row(a=1, b=7), Row(a=2, b=7), Row(a=None, b=7)]
    )
    out = zorder_key(df, ["a", "b"], bits=4).collect()
    by_a = {r["a"]: r["_zkey"] for r in out}
    assert by_a[None] is None
    assert by_a[1] is not None and by_a[2] is not None
    assert by_a[1] != by_a[2]  # distinct a-values get distinct keys


def test_compact_files_reduces_count_losslessly(spark, tmp_path):
    """compact_files merges a fragmented dataset into ~target-size
    files without changing the row multiset; with order_by it also
    re-establishes clustering (tight per-file ranges)."""
    from pyspark.sql import functions as F

    from hadoop_pcap_spark.operators.layout import (
        compact_files,
        rowgroup_prune_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frag, out, ordered = (
        str(tmp_path / "frag"),
        str(tmp_path / "out"),
        str(tmp_path / "ordered"),
    )
    docs.repartition(32).write.parquet(frag)
    stats = compact_files(spark, frag, out, target_bytes=1 << 30)
    assert stats["files_in"] == 32 and stats["files_out"] == 1
    agg = lambda d: d.agg(  # noqa: E731
        F.count("*"), F.sum("n_chars"), F.sum(F.hash("doc_id", "text"))
    ).first()
    assert agg(spark.read.parquet(out)) == agg(docs)

    # ordered compaction: target sized for >1 file, doc_id clustered
    sz = stats["bytes"]
    compact_files(spark, frag, ordered, target_bytes=sz // 4, order_by=["doc_id"])
    assert agg(spark.read.parquet(ordered)) == agg(docs)
    hi = docs.agg(F.max("doc_id")).first()[0]
    pr = rowgroup_prune_stats(ordered, {"doc_id": (0.0, hi * 0.2)})
    assert pr["skippable"] > 0  # clustering restored → stats prune


def test_zorder_key_three_columns_and_type_guard(spark):
    """N-column interleave: 3 dims × 4 bits → 12-bit key, distinct
    corner points get distinct keys and the key stays within range;
    non-numeric columns are rejected loudly (a silent all-NULL cast
    would yield a constant key and a useless layout)."""
    import pytest as _pytest

    from pyspark.sql import Row

    from hadoop_pcap_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [Row(a=i, b=j, c=k, s="x")
         for i in (0, 15) for j in (0, 15) for k in (0, 15)]
    )
    rows = zorder_key(df, ["a", "b", "c"], bits=4).collect()
    keys = {(r.a, r.b, r.c): r["_zkey"] for r in rows}
    assert len(set(keys.values())) == 8  # all corners distinct
    assert all(0 <= v < (1 << 12) for v in keys.values())
    # corner (max,max,max) owns the top key, (0,0,0) the bottom
    assert keys[(15, 15, 15)] == (1 << 12) - 1
    assert keys[(0, 0, 0)] == 0

    with _pytest.raises(TypeError, match="need numeric"):
        zorder_key(df, ["a", "s"], bits=4)


def test_zorder_key_nan_propagates_null(spark):
    """NaN must not silently clamp into the top bucket (ADVICE r6):
    width_bucket(NaN) is NULL and greatest/least skip NULLs, so
    without explicit propagation a NaN row would land in bucket n-1
    and pollute that data bucket's stats.  NaN rows key to NULL,
    exactly like NULL rows."""
    import math

    from pyspark.sql import Row

    from hadoop_pcap_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [
            Row(a=1.0, b=7.0),
            Row(a=float("nan"), b=7.0),
            Row(a=100.0, b=float("nan")),
            Row(a=100.0, b=7.0),
        ]
    )
    out = zorder_key(df, ["a", "b"], bits=4).collect()
    keys = [(r.a, r.b, r["_zkey"]) for r in out]
    top = (1 << 8) - 1
    for a, b, k in keys:
        if (a is not None and math.isnan(a)) or (b is not None and math.isnan(b)):
            assert k is None, f"NaN row got key {k}"
        else:
            assert k is not None and k < top
    # and the non-NaN max row still keys highest among real rows
    real = [k for a, b, k in keys if k is not None]
    assert max(real) == next(k for a, b, k in keys if a == 100.0 and b == 7.0)


def test_rowgroup_prune_stats_nested_and_empty(spark, tmp_path):
    """The footer audit must see Hive-partitioned (nested) part files
    — a top-level-only glob reported {row_groups: 0} on exactly the
    datasets most worth auditing (ADVICE r6) — and must raise on a
    path with no parquet at all instead of reporting 'nothing to
    prune'."""
    import pytest as _pytest

    from hadoop_pcap_spark.operators.layout import rowgroup_prune_stats

    df = spark.range(0, 1000).selectExpr("id", "id % 4 AS part")
    nested = str(tmp_path / "nested")
    df.write.partitionBy("part").parquet(nested)
    stats = rowgroup_prune_stats(nested, {"id": (0.0, 10.0)})
    assert stats["row_groups"] > 0
    assert stats["skippable"] >= 0
    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(ValueError, match="no parquet"):
        rowgroup_prune_stats(str(empty), {"id": (0.0, 1.0)})


def test_pq_ann_recall_and_rank_shape(spark):
    """PQ ANN at the defaults (16 subspaces x 64 codes, 8x shortlist,
    exact rerank): recall >=0.8 vs brute-force top-5 on the sf0.1
    embeddings — near-uniform vectors, PQ's adversarial case — while
    the approximate pass reads 16-byte codes instead of 256-byte
    vectors."""
    from hadoop_pcap_spark.operators import release_persisted

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    truth = {
        (r.q_id, r.n_id)
        for r in SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    pq = SIM.cosine_topk_pq(emb, q, k=5)
    got = pq.collect()
    release_persisted(pq)
    approx = {(r.q_id, r.n_id) for r in got}
    recall = len(truth & approx) / len(truth)
    print(f"PQ recall={recall:.2f}")
    assert recall >= 0.8, f"PQ recall too low: {recall}"
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, []).append(r)
    assert len(per_q) == 8
    for q_id, rows in per_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_ivfpq_ann_recall_and_rank_shape(spark):
    """The composed IVF+PQ index at the defaults (32 cells / 16
    probed, 16x64 codes, 16x shortlist, exact rerank): recall >=0.85
    vs brute-force top-5 on the sf0.1 embeddings.  Fully deterministic
    (sampled k-means + md5-free codes), so the measured 0.925 is
    exact, not a seed roll (r9 sweep: 12 probed / 8x shortlist gave
    0.825 — one regression from the old >=0.8 bar; the new defaults
    buy 0.1 recall for +0.8pp of flat-scan I/O, total ~3.1%)."""
    from hadoop_pcap_spark.operators import release_persisted

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    truth = {
        (r.q_id, r.n_id)
        for r in SIM.cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    res = SIM.cosine_topk_ivfpq(emb, q, k=5)
    got = res.collect()
    release_persisted(res)
    approx = {(r.q_id, r.n_id) for r in got}
    recall = len(truth & approx) / len(truth)
    print(f"IVF+PQ recall={recall:.2f}")
    assert recall >= 0.85, f"IVF+PQ recall too low: {recall}"
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, []).append(r)
    for q_id, rows in per_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))


def test_kmeans_assign_matches_numpy_argmin(spark):
    """kmeans_assign: every vector assigned; the Spark-side nearest-
    centroid decision (incl. the lowest-id tie-break) matches an
    independent numpy argmin over the same deterministically trained
    centroids; dist2 is the true squared L2."""
    import numpy as np

    from hadoop_pcap_spark.operators.similarity import (
        _kmeans_centroids,
        kmeans_assign,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = {r.vec_id: r for r in kmeans_assign(emb, n_cells=8).collect()}
    assert len(out) == emb.count()
    rows = emb.orderBy("vec_id").collect()
    C = _kmeans_centroids([r.embedding for r in rows[:2048]], 8)
    X = np.asarray([r.embedding for r in rows], dtype=np.float64)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    for i, r in enumerate(rows):
        got = out[r.vec_id]
        assert got.cluster_id == int(d2[i].argmin())
        assert abs(got.dist2 - d2[i].min()) < 1e-9
        assert got.dist2 >= 0


def test_rp_sign_bands_engines_bit_identical(spark, emb):
    """The vectorized Arrow band engine and the pure-expression engine
    produce IDENTICAL (doc_id, band, key) rows — the sequential
    numpy accumulation replays the unrolled expression's IEEE order
    exactly, which is what keeps the DuckDB oracle valid for either."""
    vecs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    a = {(r.doc_id, r.band, r.key)
         for r in SIM.rp_sign_bands(vecs, engine="arrow").collect()}
    b = {(r.doc_id, r.band, r.key)
         for r in SIM.rp_sign_bands(vecs, engine="expr").collect()}
    assert a == b and len(a) > 0


def test_rp_band_params_scaling_law():
    """Auto-sizing holds bucket size ~constant (planes ≈ log2(n/32))
    and recomputes bands from the S-curve; at ≤2k vectors it equals
    the historical fixed defaults so small-corpus results are
    unchanged."""
    from hadoop_pcap_spark.operators.similarity import rp_band_params

    assert rp_band_params(550) == (8, 12)
    assert rp_band_params(2050) == (8, 12)
    p1, b1 = rp_band_params(60050)
    p2, b2 = rp_band_params(1_000_000)
    assert p2 > p1 > 8  # planes grow with n
    assert b2 > b1 >= 12  # bands grow to hold the recall target
    # expected bucket size stays bounded near the target
    for n in (60050, 1_000_000):
        planes, _ = rp_band_params(n)
        assert n / 2 ** planes <= 64


def test_qcol_escapes_backticks(spark):
    """ADVICE r11: a column name containing a literal backtick must
    render into F.expr strings without breaking out of the quoting —
    doubled-backtick escape, matching SQL quoted-identifier rules."""
    from hadoop_pcap_spark.operators.similarity import _dot, _qcol

    assert _qcol("a`b") == "`a``b`"
    assert _qcol("plain.nested") == "`plain`.`nested`"
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], ["wei`rd", "normal"]
    )
    row = df.select(
        _dot("wei`rd", "normal", dim=2).alias("d")
    ).first()
    assert row.d == 1.0 * 3.0 + 2.0 * 4.0


def test_ann_index_prune_rejects_malformed_query_vectors(spark, emb):
    """ADVICE r11: the driver-side routing replay must fail loudly on
    a query vector violating the index dim contract (NULL / wrong
    length / non-finite) instead of IndexError-ing or silently pruning
    a diverging cell set."""
    import pytest

    from hadoop_pcap_spark.operators.ann_index import (
        cosine_topk_indexed,
        read_ann_index,
        write_ann_index,
    )

    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("ann_dimguard_probe", "ann_dimguard_probe__model"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    try:
        write_ann_index(emb, "ann_dimguard_probe", n_cells=4, sample_size=128)
        idx = read_ann_index(spark, "ann_dimguard_probe")
        short = emb.limit(1).select(
            "vec_id", F.slice("embedding", 1, 3).alias("embedding")
        )
        with pytest.raises(ValueError, match="dim contract"):
            cosine_topk_indexed(idx, short, emb, k=2, n_probe=2).collect()
        null_vec = emb.limit(1).select(
            "vec_id",
            F.lit(None).cast(emb.schema["embedding"].dataType).alias("embedding"),
        )
        with pytest.raises(ValueError, match="dim contract"):
            cosine_topk_indexed(idx, null_vec, emb, k=2, n_probe=2).collect()
        nan_vec = emb.limit(1).select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.lit(float("nan"))
            ).alias("embedding"),
        )
        with pytest.raises(ValueError, match="dim contract"):
            cosine_topk_indexed(idx, nan_vec, emb, k=2, n_probe=2).collect()
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_dimguard_probe")
        spark.sql("DROP TABLE IF EXISTS ann_dimguard_probe__model")


# --- sub-document duplicate spans (suffix-array motif, r12) -------------------


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_spans_planted_passage(spark):
    """Two docs share one 20-token passage at DIFFERENT token offsets;
    exactly one span per doc must cover it: start at the passage's
    token position, n_toks == 20, 13 merged shingles (k=8), and the
    SAME cluster id across both docs."""
    from hadoop_pcap_spark.operators.contamination import duplicate_spans

    passage = " ".join(f"shared{i}" for i in range(20))
    docs = _span_docs(spark, [
        (1, " ".join(f"a{i}" for i in range(5)) + " " + passage + " "
            + " ".join(f"a{i}" for i in range(5, 12))),
        (2, " ".join(f"b{i}" for i in range(11)) + " " + passage + " "
            + " ".join(f"b{i}" for i in range(11, 14))),
        (3, " ".join(f"c{i}" for i in range(40))),
    ])
    spans = {r.doc_id: r for r in duplicate_spans(docs, k=8).collect()}
    assert set(spans) == {1, 2}
    assert (spans[1].start_tok, spans[1].n_toks, spans[1].n_shingles) == (6, 20, 13)
    assert (spans[2].start_tok, spans[2].n_toks, spans[2].n_shingles) == (12, 20, 13)
    assert spans[1].cluster == spans[2].cluster


def test_duplicate_spans_island_separation(spark):
    """Two planted passages separated by unique filler in the same doc
    → two DISTINCT spans (the interval merge must not bridge the gap),
    while touching/overlapping shingle runs merge into one."""
    from hadoop_pcap_spark.operators.contamination import duplicate_spans

    p1 = " ".join(f"x{i}" for i in range(9))
    p2 = " ".join(f"y{i}" for i in range(10))
    docs = _span_docs(spark, [
        (1, p1 + " " + " ".join(f"f{i}" for i in range(15)) + " " + p2),
        (2, p1 + " " + " ".join(f"g{i}" for i in range(20)) + " " + p2),
    ])
    got = sorted(
        duplicate_spans(docs, k=8).collect(),
        key=lambda r: (r.doc_id, r.start_tok),
    )
    assert [(r.doc_id, r.start_tok, r.n_toks) for r in got] == [
        (1, 1, 9), (1, 25, 10), (2, 1, 9), (2, 30, 10)]
    # cluster ids pair up across docs per passage
    assert got[0].cluster == got[2].cluster
    assert got[1].cluster == got[3].cluster
    assert got[0].cluster != got[1].cluster


def test_duplicate_spans_within_doc_repeat_not_flagged(spark):
    """A passage repeated only WITHIN one document is not a cross-doc
    duplicate (min_docs counts distinct documents); docs shorter than
    k tokens emit nothing."""
    from hadoop_pcap_spark.operators.contamination import duplicate_spans

    rep = " ".join(f"r{i}" for i in range(8))
    docs = _span_docs(spark, [
        (1, rep + " mid1 mid2 mid3 " + rep),
        (2, " ".join(f"q{i}" for i in range(30))),
        (3, "too short"),
    ])
    assert duplicate_spans(docs, k=8).count() == 0


@pytest.mark.skipif(
    not os.path.isdir("/tmp/spark_graft_sf1"),
    reason="needs the sf1-equivalent corpus (tools/make_scaled_sf.py)",
)
def test_duplicate_spans_planted_at_sf1(spark):
    """VERDICT r11 item 5 'planted-span tests at sf1': union the 235k-
    doc scaled corpus with two synthetic docs sharing a marker passage
    whose tokens exist nowhere in the corpus; the operator must
    recover exactly that span for both docs at full scale — linearity
    + no-collision in one run."""
    from hadoop_pcap_spark.operators.contamination import duplicate_spans

    corpus = spark.read.parquet("/tmp/spark_graft_sf1/documents.parquet").select(
        "doc_id", "text"
    )
    passage = " ".join(f"zqxmarker{i}" for i in range(24))
    planted = _span_docs(spark, [
        (10**12 + 1, "zqxpadA0 zqxpadA1 " + passage + " zqxpadA2"),
        (10**12 + 2, " ".join(f"zqxpadB{i}" for i in range(7)) + " " + passage),
    ])
    spans = (
        duplicate_spans(corpus.unionByName(planted), k=8)
        .filter(F.col("doc_id") >= 10**12)
        .collect()
    )
    got = {r.doc_id: r for r in spans}
    assert set(got) == {10**12 + 1, 10**12 + 2}
    assert (got[10**12 + 1].start_tok, got[10**12 + 1].n_toks) == (3, 24)
    assert (got[10**12 + 2].start_tok, got[10**12 + 2].n_toks) == (8, 24)
    assert got[10**12 + 1].cluster == got[10**12 + 2].cluster


def test_remove_duplicate_spans_planted(spark):
    """End-to-end span REMOVAL: two docs sharing a passage keep only
    their unique filler; a doc that IS the passage empties out
    (n_removed == n_toks, md5('') fingerprint); a doc with no spans
    passes through untouched."""
    import hashlib

    from hadoop_pcap_spark.operators.contamination import (
        remove_duplicate_spans,
    )

    passage = " ".join(f"shared{i}" for i in range(20))
    filler_a = " ".join(f"a{i}" for i in range(6))
    filler_b = " ".join(f"b{i}" for i in range(7))
    clean = " ".join(f"c{i}" for i in range(30))
    docs = _span_docs(spark, [
        (1, filler_a + " " + passage),
        (2, passage + " " + filler_b),
        (3, passage),
        (4, clean),
    ])
    got = {r.doc_id: r for r in remove_duplicate_spans(docs, k=8).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert (got[1].n_toks, got[1].n_removed) == (26, 20)
    assert got[1].clean_md5 == md5(filler_a)
    assert (got[2].n_toks, got[2].n_removed) == (27, 20)
    assert got[2].clean_md5 == md5(filler_b)
    assert (got[3].n_toks, got[3].n_removed) == (20, 20)
    assert got[3].clean_md5 == md5("")
    assert (got[4].n_toks, got[4].n_removed) == (30, 0)
    assert got[4].clean_md5 == md5(clean)


def test_repetition_signals_hand_computed(spark):
    """Gopher repetition fractions against hand-computed values:
    'a b a b a b' — top 2-gram 'a b' covers 3×3=9 of 11 chars; the
    overlap approximation lets top4 exceed 1.0 (documented); a
    distinct-token doc scores the 1-occurrence floor; a doc repeating
    a 6-gram pays (count-1)×chars in dup6."""
    from hadoop_pcap_spark.operators.repetition import repetition_signals

    docs = _span_docs(spark, [
        (1, "a b a b a b"),
        (2, " ".join(f"x{i}" for i in range(8))),
        (3, "p q r s t u p q r s t u"),
    ])
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert got[1].top2_gram_char_frac == round(9 / 11, 6)
    assert got[1].top3_gram_char_frac == round(10 / 11, 6)
    assert got[1].top4_gram_char_frac == round(14 / 11, 6)
    assert got[1].dup6_gram_char_frac == 0.0
    assert got[2].top2_gram_char_frac == round(5 / 23, 6)
    assert got[2].top3_gram_char_frac == round(8 / 23, 6)
    assert got[2].top4_gram_char_frac == round(11 / 23, 6)
    assert got[2].dup6_gram_char_frac == 0.0
    assert got[3].top2_gram_char_frac == round(6 / 23, 6)
    assert got[3].top4_gram_char_frac == round(14 / 23, 6)
    assert got[3].dup6_gram_char_frac == round(11 / 23, 6)
