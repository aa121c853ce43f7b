"""Unit semantics for operators/merge.py (VERDICT r7 item 1): CDC
merge winner/delete/resurrect paths, loud failure on malformed input,
and the NULL-run island classes (value→NULL, NULL→NULL, NULL→value)
the r7 implementation got wrong.  The driver-facing hash contract
lives in plans/incremental.py; these pin the small semantics an
aggregate hash can blur."""

import datetime

import pytest

from pyspark.sql import Row, Window, functions as F

from hadoop_pcap_spark.operators.merge import merge_cdc, scd2_history


def _snap(spark):
    return spark.createDataFrame(
        [
            Row(k=1, v="a", n=10),
            Row(k=2, v="b", n=20),
            Row(k=3, v="c", n=30),
        ]
    )


def _chg(spark, rows):
    return spark.createDataFrame(
        rows,
        schema="k bigint, v string, n bigint, _seq bigint, _op string",
    )


def _collect_map(df):
    return {r["k"]: (r["v"], r["n"]) for r in df.collect()}


def test_merge_upsert_delete_and_untouched(spark):
    out = merge_cdc(
        _snap(spark),
        _chg(
            spark,
            [
                (1, "a2", 11, 5, "U"),  # update
                (2, None, None, 5, "D"),  # delete
                (4, "d", 40, 5, "U"),  # insert of a new key
            ],
        ),
        ["k"],
    )
    assert _collect_map(out) == {
        1: ("a2", 11),
        3: ("c", 30),  # untouched snapshot row survives verbatim
        4: ("d", 40),
    }


def test_merge_highest_seq_wins_and_resurrects(spark):
    out = merge_cdc(
        _snap(spark),
        _chg(
            spark,
            [
                (1, "old", 1, 1, "U"),
                (1, None, None, 2, "D"),
                (1, "new", 3, 3, "U"),  # delete-then-resurrect
                (2, "mid", 2, 2, "U"),
                (2, None, None, 9, "D"),  # latest wins ⇒ gone
            ],
        ),
        ["k"],
    )
    assert _collect_map(out) == {1: ("new", 3), 3: ("c", 30)}


def test_merge_empty_batch_is_identity(spark):
    out = merge_cdc(_snap(spark), _chg(spark, []), ["k"])
    assert _collect_map(out) == _collect_map(_snap(spark))


def test_merge_change_row_may_carry_nulls(spark):
    # a NULL attribute VALUE is a legal update (sets the field NULL) —
    # only NULL op/seq are malformed
    out = merge_cdc(_snap(spark), _chg(spark, [(1, None, None, 5, "U")]), ["k"])
    assert _collect_map(out)[1] == (None, None)


@pytest.mark.parametrize(
    "row",
    [
        (1, "x", 1, 5, None),  # NULL op
        (1, "x", 1, 5, "X"),  # op outside {'U','D'}
        (1, "x", 1, None, "U"),  # NULL seq
    ],
)
def test_merge_malformed_cdc_rows_fail_loudly(spark, row):
    # ADVICE r7: `op != 'D'` silently deleted NULL-op rows; the
    # contract is now enforced with raise_error, not a quiet filter
    with pytest.raises(Exception) as ei:
        merge_cdc(_snap(spark), _chg(spark, [row]), ["k"]).collect()
    assert "merge_cdc" in str(ei.value)


def test_merge_matches_union_window_formulation(spark):
    # join-based plan ≡ the textbook union+row_number formulation on
    # a dense generated changelog (every key touched several times)
    snap = spark.range(200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("v"),
        (F.col("id") * 10).alias("n"),
    )
    chg = spark.range(1000).select(
        (F.col("id") % 250).alias("k"),
        F.concat(F.lit("c"), F.col("id")).alias("v"),
        F.col("id").alias("n"),
        (F.col("id") + 1).alias("_seq"),
        F.when(F.col("id") % 11 == 0, F.lit("D")).otherwise(F.lit("U")).alias("_op"),
    )
    got = merge_cdc(snap, chg, ["k"])
    base = snap.withColumn("_op", F.lit("U")).withColumn("_seq", F.lit(0).cast("long"))
    w = Window.partitionBy("k").orderBy(F.col("_seq").desc())
    want = (
        base.unionByName(chg)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != "D"))
        .select("k", "v", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ---------------------------------------------------------------- scd2


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, schema="k bigint, a string, ts date, tb bigint"
    )


def _d(n):
    return datetime.date(2026, 1, n)


def _hist(spark, rows):
    out = scd2_history(_obs(spark, rows), "k", "a", "ts", "tb").collect()
    return sorted(
        (r["k"], r["version"], r["a"], r["valid_from"], r["valid_to"], r["n_obs"])
        for r in out
    )


def test_scd2_basic_islands_and_intervals(spark):
    rows = [
        (1, "x", _d(1), 1),
        (1, "x", _d(2), 2),
        (1, "y", _d(3), 3),
        (1, "x", _d(4), 4),  # back to x ⇒ NEW version, not merged
        (2, "z", _d(1), 5),
    ]
    assert _hist(spark, rows) == [
        (1, 1, "x", _d(1), _d(3), 2),
        (1, 2, "y", _d(3), _d(4), 1),
        (1, 3, "x", _d(4), None, 1),
        (2, 1, "z", _d(1), None, 1),
    ]


def test_scd2_null_runs(spark):
    # the three ADVICE-r7 classes: value→NULL must OPEN an island
    # (not be absorbed), NULL→NULL must CONTINUE one (not one
    # version per row), NULL→value must close it
    rows = [
        (1, "x", _d(1), 1),
        (1, None, _d(2), 2),  # value→NULL
        (1, None, _d(3), 3),  # NULL→NULL
        (1, None, _d(4), 4),
        (1, "x", _d(5), 5),  # NULL→value
    ]
    assert _hist(spark, rows) == [
        (1, 1, "x", _d(1), _d(2), 1),
        (1, 2, None, _d(2), _d(5), 3),
        (1, 3, "x", _d(5), None, 1),
    ]


def test_scd2_all_null_and_leading_null_keys(spark):
    rows = [
        (1, None, _d(1), 1),  # first row NULL: island 1 even though
        (1, None, _d(2), 2),  # lag-is-null can't see a "change"
        (2, None, _d(1), 3),
        (2, "y", _d(2), 4),
    ]
    assert _hist(spark, rows) == [
        (1, 1, None, _d(1), None, 2),
        (2, 1, None, _d(1), _d(2), 1),
        (2, 2, "y", _d(2), None, 1),
    ]


def test_scd2_same_day_ties_break_on_tie_break(spark):
    # two same-date observations: tb orders them totally, so the
    # island sequence (and lead chain) is deterministic
    rows = [
        (1, "x", _d(1), 2),
        (1, "y", _d(1), 1),  # tb=1 sorts FIRST
        (1, "y", _d(2), 3),
    ]
    assert _hist(spark, rows) == [
        (1, 1, "y", _d(1), _d(1), 1),
        (1, 2, "x", _d(1), _d(2), 1),
        (1, 3, "y", _d(2), None, 1),
    ]
