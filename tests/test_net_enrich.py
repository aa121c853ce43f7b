"""LPM/CIDR enrichment join (operators/net_enrich.py)."""

from pyspark.sql import functions as F

from hadoop_pcap_spark.operators.net_enrich import lpm_lookup, parse_routes


def _routes(spark, rows):
    return spark.createDataFrame(rows, "cidr string, label string")


def test_longest_prefix_wins(spark):
    routes = _routes(spark, [
        ("0.0.0.0/0", "default"),
        ("10.0.0.0/8", "corp"),
        ("10.0.1.0/24", "dmz"),
        ("10.0.1.7/32", "honeypot"),  # host route beats the /24
    ])
    ips = spark.createDataFrame(
        [("10.0.1.7",), ("10.0.1.9",), ("10.9.9.9",), ("8.8.8.8",)],
        "ip string",
    )
    got = {r["ip"]: (r["label"], r["plen"])
           for r in lpm_lookup(ips, routes).collect()}
    assert got == {
        "10.0.1.7": ("honeypot", 32),
        "10.0.1.9": ("dmz", 24),
        "10.9.9.9": ("corp", 8),
        "8.8.8.8": ("default", 0),
    }


def test_non_canonical_route_keys_correctly(spark):
    # 192.168.5.77/24 must behave as 192.168.5.0/24
    routes = _routes(spark, [("192.168.5.77/24", "lan")])
    ips = spark.createDataFrame([("192.168.5.1",), ("192.168.6.1",)],
                                "ip string")
    got = {r["ip"]: r["label"] for r in lpm_lookup(ips, routes).collect()}
    assert got == {"192.168.5.1": "lan"}  # .6.1 unmatched → dropped


def test_plen_tie_breaks_deterministically(spark):
    routes = _routes(spark, [
        ("172.16.0.0/12", "zebra"),
        ("172.16.0.0/12", "alpha"),
    ])
    ips = spark.createDataFrame([("172.16.3.4",)], "ip string")
    rows = lpm_lookup(ips, routes).collect()
    assert len(rows) == 1 and rows[0]["label"] == "alpha"


def test_parse_routes_zero_plen(spark):
    r = parse_routes(_routes(spark, [("0.0.0.0/0", "d")])).collect()[0]
    assert r["plen"] == 0 and r["net_key"] == 0


def test_extra_input_columns_survive(spark):
    routes = _routes(spark, [("10.0.0.0/8", "corp")])
    ips = spark.createDataFrame([("10.1.2.3", 42)], "ip string, n int")
    row = lpm_lookup(ips, routes).collect()[0]
    assert row["n"] == 42 and row["label"] == "corp"


def test_broadcast_no_nested_loop(spark):
    """The route join must be a broadcast HASH join (the whole point —
    a theta-join would be BroadcastNestedLoop)."""
    routes = _routes(spark, [("10.0.0.0/8", "corp"), ("10.0.1.0/24", "dmz")])
    ips = spark.createDataFrame([("10.0.1.1",)], "ip string")
    plan = (lpm_lookup(ips, routes)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    assert "BatchEvalPython" not in plan


def test_duplicate_input_rows_each_get_a_verdict(spark):
    """Two input rows with the same address must yield two output rows
    (the winner window partitions on a transient row id, not the
    address — r10 review finding)."""
    routes = _routes(spark, [("10.0.0.0/8", "corp")])
    ips = spark.createDataFrame(
        [("10.0.0.1", 1), ("10.0.0.1", 2), ("10.0.0.2", 3)],
        "ip string, n int",
    )
    rows = lpm_lookup(ips, routes).collect()
    assert len(rows) == 3
    assert sorted(r["n"] for r in rows) == [1, 2, 3]
    assert all(r["label"] == "corp" for r in rows)
