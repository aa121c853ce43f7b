"""Structured Streaming analogs (SURVEY.md §2.4 'streaming analogs').

The reference has no streaming story — a live capture feed would just
be more pcap files appearing in a directory.  That maps exactly to
Spark's file streaming source: same wide schema, same query shapes,
plus watermarked windows and within-watermark dedup for late/duplicate
packets.

Each builder below takes a streaming DataFrame of the packet/event
shape and returns the transformed streaming DataFrame; tests drive
them with the memory sink and assert batch-equivalence (a streaming
query over a static directory must equal the batch query — exactness
check no oracle can do better)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts per key with a watermark for late data.
    Scale: streaming state is one row per (window, key); watermark
    bounds state size."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def sliding_rates(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rate — the top-talker monitor shape."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"))
        .agg(F.count("*").alias("n"), F.approx_count_distinct("user_id").alias("users"))
        .select(F.col("win.start").alias("win_start"), "n", "users")
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per key (gap-based) — flow/sessionization of the
    packet stream (per-flow session = same motif)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            key_col,
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — dropDuplicatesWithinWatermark, the
    streaming twin of the md5-dedup motif (state bounded by the
    watermark horizon)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left row
    with the right rows sharing ``key`` whose event time falls in
    ``[left_ts, left_ts + max_gap]`` — the impression→conversion /
    request→response correlation motif (for packets: SYN→response,
    query→answer across two capture feeds).

    Contract: ``left_ts`` and ``right_ts`` must be *different* column
    names and all non-``key`` columns disjoint (rename before
    calling), so the joined schema is unambiguous.  Both sides carry
    the same ``watermark`` delay; the time-range predicate on the two
    event-time columns is what lets Spark derive a state eviction
    bound from it.

    Scale: both sides shuffle once on ``key``; per-key join state
    retains only rows within ``watermark + max_gap`` of the global
    watermark, so state is bounded by the stream rate × horizon, not
    by history.  ``how='left_outer'`` is supported but emits
    NULL-extended rows only once the watermark passes a left row —
    under ``availableNow`` the tail's unmatched rows stay in state
    for the next run rather than being emitted at stream end (use
    inner for run-bounded batch equivalence)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, how).drop(r[key])


FLOW_STATE_OUTPUT = "user_id LONG, n_events LONG, total_value DOUBLE, batch_events LONG"
FLOW_STATE_SCHEMA = "n LONG, total DOUBLE"


def stateful_flow_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running event count + value total maintained across micro-batches
    (the per-flow packet/byte-counter motif — state the built-in
    windowed aggs can't express when it must accumulate forever and
    emit per-batch deltas).

    Scale: state lives in the state store partitioned by key; each
    micro-batch touches only keys present in the batch.

    Cost model (measured, tools/profile_streaming.py, 100k rows /
    1500 keys / 1 micro-batch): the dominant term is a PER-STATE-
    PARTITION fixed cost of ~0.45 cpu-s per micro-batch — state-store
    commit plus a Python worker fork per partition — shared roughly
    half/half between the JVM floor (a no-Python built-in streaming
    agg pays it too) and the Python boundary; per-ROW and per-KEY
    work, state tuple serde, and the 1-row output frames are all in
    the noise.  So the operative knob is ``spark.sql.shuffle.
    partitions`` AT FIRST QUERY START (it freezes into the
    checkpoint): size it to key cardinality × arrival rate, not to
    the box's core count — 1500 keys want ~8 partitions (4.4 cpu-s
    end-to-end), not 32 (18.4 cpu-s for identical output).  At 100×
    the event rate the per-partition cost amortizes over 100× the
    rows and the same sizing logic simply yields a bigger number."""
    import numpy as np
    import pandas as pd

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            # nansum on the raw ndarray: no dropna copy per chunk
            total += float(np.nansum(pdf["value"].to_numpy()))
        n += batch_n
        state.update((n, float(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(float(total), 4)],
                "batch_events": [batch_n],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=FLOW_STATE_OUTPUT,
        stateStructType=FLOW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


DNS_TCP_OUTPUT = (
    "src STRING, dst STRING, src_port INT, dst_port INT, msg_no INT, "
    "dns_queryid INT, dns_flags STRING, dns_qr BOOLEAN, dns_opcode STRING, "
    "dns_rcode STRING, dns_qname STRING, dns_qtype INT, dns_qtype_str STRING, "
    "dns_answer ARRAY<STRING>, dns_authority ARRAY<STRING>, "
    "dns_additional ARRAY<STRING>, n_segments BIGINT"
)
DNS_TCP_STATE = "residual BINARY, n_msgs BIGINT, n_segments BIGINT"

HTTP_STREAM_OUTPUT = (
    "client STRING, server STRING, server_port INT, obj_no INT, "
    "method STRING, url STRING, status INT, content_type STRING, "
    "content_encoding STRING, chunked BOOLEAN, body_len INT, body BINARY"
)
HTTP_STREAM_STATE = (
    "a_resid BINARY, b_resid BINARY, client_is_a INT, n_objs BIGINT, "
    "pending STRING"
)


def streaming_http_objects(
    packets: DataFrame,
    max_flow_bytes: int = 64 * 1024 * 1024,
    max_pending: int = 1024,
) -> DataFrame:
    """HTTP/1.x object extraction as a custom stateful streaming
    operator (applyInPandasWithState) — the live twin of
    :func:`..operators.http.http_objects`, for tailing rotated
    capture directories: a CONNECTION that spans capture files (and
    therefore micro-batches) still yields each object exactly once,
    when its response framing completes.

    Per-connection state: the two directional byte RESIDUALS (bytes
    not yet consumed by a complete message), the request/response
    direction assignment once classified by content, the emitted
    object counter, and the parsed-but-unanswered request queue
    (method+url, JSON-encoded, capped at ``max_pending``) that pairs
    pipelined responses arriving in later batches.

    Documented streaming limitation: a CLOSE-DELIMITED response (no
    Content-Length, not chunked) has no knowable end on a live stream
    — it is never emitted here (the batch operator recovers it at
    flow end); ``parse_responses_incremental`` stops at its start.
    Hot-flow guard: a residual beyond ``max_flow_bytes`` resets that
    direction (dropping buffered bytes) rather than growing state.

    Input: a streaming packet DataFrame with at least
    src/dst/src_port/dst_port/protocol/ts/pkt_no/payload."""
    import json as _json

    import pandas as pd

    from ..operators.http import (
        _METHODS,
        parse_requests_incremental,
        parse_responses_incremental,
    )

    from ..operators.flows import canonical_pair_exprs

    a_first, _src_ep, _dst_ep = canonical_pair_exprs()
    segments = (
        packets.filter(
            (F.col("protocol") == "TCP")
            & F.col("payload").isNotNull()
            & (F.length("payload") > 0)
        )
        .select(
            F.when(a_first, F.col("src")).otherwise(F.col("dst")).alias("a_ip"),
            F.when(a_first, F.col("src_port")).otherwise(F.col("dst_port"))
            .alias("a_port"),
            F.when(a_first, F.col("dst")).otherwise(F.col("src")).alias("b_ip"),
            F.when(a_first, F.col("dst_port")).otherwise(F.col("src_port"))
            .alias("b_port"),
            "src", "src_port", "ts", "pkt_no", "payload",
            *(["ts_usec"] if "ts_usec" in packets.columns else []),
        )
    )

    def _classify(res: bytes):
        if res.startswith(_METHODS):
            return "req"
        if res.startswith(b"HTTP/1."):
            return "resp"
        return None

    def update(key, pdfs, state):
        a_ip, a_port, b_ip, b_port = key
        a_res, b_res, client_is_a, n_objs, pending_json = (
            state.get if state.exists else (b"", b"", 0, 0, "[]")
        )
        a_res, b_res = bytes(a_res or b""), bytes(b_res or b"")
        pending = _json.loads(pending_json or "[]")
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            # ts is whole seconds and pkt_no restarts per capture file:
            # a micro-batch spanning a rotation boundary needs the
            # sub-second ts_usec tie-break to keep same-second segments
            # of one connection in capture order across files
            order = [c for c in ("ts", "ts_usec", "pkt_no") if c in batch.columns]
            batch = batch.sort_values(order, kind="stable")
            for _, row in batch.iterrows():
                p = row["payload"]
                if p is None:
                    continue
                sp = None if pd.isna(row["src_port"]) else int(row["src_port"])
                if (row["src"], sp) == (a_ip, a_port):
                    a_res += bytes(p)
                else:
                    b_res += bytes(p)
        if client_is_a == 0:
            ka, kb = _classify(a_res), _classify(b_res)
            if ka == "req" or kb == "resp":
                client_is_a = 1
            elif kb == "req" or ka == "resp":
                client_is_a = 2
        rows = []
        if client_is_a:
            if client_is_a == 1:
                req_res, resp_res = a_res, b_res
                client, server, sport = a_ip, b_ip, b_port
            else:
                req_res, resp_res = b_res, a_res
                client, server, sport = b_ip, a_ip, a_port
            if len(pending) < max_pending:
                # cap by REFUSING to consume further requests (their
                # bytes stay in the residual, bounded by the byte cap)
                # — dropping already-parsed entries would desync the
                # FIFO request/response pairing permanently
                reqs, used = parse_requests_incremental(req_res)
                req_res = req_res[used:]
                for rq in reqs:
                    target = rq["target"]
                    if target.startswith(("http://", "https://")):
                        url = target
                    else:
                        host = rq["host"] or (
                            server if sport is None else f"{server}:{sport}"
                        )
                        url = f"http://{host}{target}"
                    pending.append({"method": rq["method"], "url": url})
            resps, used = parse_responses_incremental(
                resp_res, methods=[p["method"] for p in pending]
            )
            resp_res = resp_res[used:]
            for rs in resps:
                rq = pending.pop(0) if pending else {"method": None, "url": None}
                n_objs += 1
                rows.append(
                    {
                        "client": client,
                        "server": server,
                        "server_port": sport,
                        "obj_no": n_objs,
                        "method": rq["method"],
                        "url": rq["url"],
                        "status": rs["status"],
                        "content_type": rs["content_type"],
                        "content_encoding": rs["content_encoding"],
                        "chunked": rs["chunked"],
                        "body_len": len(rs["body"]),
                        "body": rs["body"],
                    }
                )
            if client_is_a == 1:
                a_res, b_res = req_res, resp_res
            else:
                b_res, a_res = req_res, resp_res
        if len(a_res) > max_flow_bytes:
            a_res = b""  # hot-flow guard: reset, resync later
        if len(b_res) > max_flow_bytes:
            b_res = b""
        state.update(
            (a_res, b_res, client_is_a, n_objs, _json.dumps(pending))
        )
        if rows:
            yield pd.DataFrame(rows)

    return segments.groupBy(
        "a_ip", "a_port", "b_ip", "b_port"
    ).applyInPandasWithState(
        update,
        outputStructType=HTTP_STREAM_OUTPUT,
        stateStructType=HTTP_STREAM_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


TLS_STREAM_OUTPUT = (
    "client STRING, server STRING, server_port INT, sni STRING, "
    "alpn STRING, ja3 STRING, ja3_md5 STRING"
)
TLS_STREAM_STATE = "a_resid BINARY, b_resid BINARY, done BOOLEAN"


def streaming_tls_clienthellos(
    packets: DataFrame,
    max_handshake_bytes: int = 64 * 1024,
) -> DataFrame:
    """LIVE TLS client telemetry (applyInPandasWithState): one row per
    TCP connection, emitted exactly once when its ClientHello's
    records COMPLETE — SNI / offered ALPN / JA3, the what-client-went-
    where feed a network monitor tails in real time.  A hello whose
    TCP segments span rotated capture files (micro-batches) emits when
    the last byte arrives; server-side fields are intentionally absent
    (the ServerHello may be seconds away — this is the low-latency
    client side; the batch operator :func:`..operators.tls.
    tls_handshakes` joins both halves).

    State per connection: the two directional byte residuals until the
    ClientHello parses (then cleared, ``done`` pinned so the
    connection's remaining traffic is consumed at zero state cost).  A
    direction exceeding ``max_handshake_bytes`` without a parseable
    ClientHello marks the connection done (not TLS / missed handshake
    — state bounded either way)."""
    import pandas as pd

    from ..operators.flows import canonical_pair_exprs
    from ..operators.tls import handshake_messages, ja3_string, parse_client_hello
    from ..operators.tls import _md5 as _ja3_md5

    a_first, _se, _de = canonical_pair_exprs()
    segments = (
        packets.filter(
            (F.col("protocol") == "TCP")
            & F.col("payload").isNotNull()
            & (F.length("payload") > 0)
        )
        .select(
            F.when(a_first, F.col("src")).otherwise(F.col("dst")).alias("a_ip"),
            F.when(a_first, F.col("src_port")).otherwise(F.col("dst_port"))
            .alias("a_port"),
            F.when(a_first, F.col("dst")).otherwise(F.col("src")).alias("b_ip"),
            F.when(a_first, F.col("dst_port")).otherwise(F.col("src_port"))
            .alias("b_port"),
            "src", "src_port", "ts", "pkt_no", "payload",
            *(["ts_usec"] if "ts_usec" in packets.columns else []),
        )
    )

    def update(key, pdfs, state):
        a_ip, a_port, b_ip, b_port = key
        a_res, b_res, done = (
            state.get if state.exists else (b"", b"", False)
        )
        if done:
            for _ in pdfs:
                pass  # drain: connection already reported (or ruled out)
            state.update((b"", b"", True))
            return
        a_res, b_res = bytes(a_res or b""), bytes(b_res or b"")
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            order = [c for c in ("ts", "ts_usec", "pkt_no") if c in batch.columns]
            batch = batch.sort_values(order, kind="stable")
            for _, row in batch.iterrows():
                p = row["payload"]
                if p is None:
                    continue
                sp = None if pd.isna(row["src_port"]) else int(row["src_port"])
                if (row["src"], sp) == (a_ip, a_port):
                    a_res += bytes(p)
                else:
                    b_res += bytes(p)
        ch = None
        ch_dir_a = True
        for is_a, stream in ((True, a_res), (False, b_res)):
            for msg_type, body in handshake_messages(stream):
                if msg_type == 1:
                    ch = parse_client_hello(body)
                    ch_dir_a = is_a
                break  # first message classifies the direction
            if ch is not None:
                break
        if ch is not None:
            state.update((b"", b"", True))
            if ch_dir_a:
                client, server, sport = a_ip, b_ip, b_port
            else:
                client, server, sport = b_ip, a_ip, a_port
            ja3 = ja3_string(ch)
            yield pd.DataFrame(
                [
                    {
                        "client": client,
                        "server": server,
                        "server_port": None if sport is None else int(sport),
                        "sni": ch["sni"],
                        "alpn": ",".join(ch["alpn"]) if ch["alpn"] else None,
                        "ja3": ja3,
                        "ja3_md5": _ja3_md5(ja3),
                    }
                ]
            )
            return
        if len(a_res) > max_handshake_bytes or len(b_res) > max_handshake_bytes:
            state.update((b"", b"", True))  # not TLS / missed: rule out
            return
        state.update((a_res, b_res, False))

    return segments.groupBy(
        "a_ip", "a_port", "b_ip", "b_port"
    ).applyInPandasWithState(
        update,
        outputStructType=TLS_STREAM_OUTPUT,
        stateStructType=TLS_STREAM_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_dns_tcp_reassembly(
    packets: DataFrame,
    max_flow_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """DNS-over-TCP reassembly as a custom stateful streaming operator
    (applyInPandasWithState) — the live twin of
    :func:`..operators.flows.reassemble_dns_tcp`.

    Per-flow state is the *unconsumed byte residual* of the TCP stream
    plus message/segment counters: each micro-batch appends its
    segments in capture order, walks the RFC 1035 §4.2.2 length-prefix
    framing, emits every message that COMPLETED in this batch
    (``msg_no`` continues across batches), and carries the incomplete
    tail forward — so a message split across micro-batches is emitted
    exactly once, when its last segment arrives.

    State hygiene: after framing, a carried residual larger than
    ``max_flow_bytes`` resets the flow (dropping the buffered bytes —
    the hot-flow guard; clipping the NEW bytes instead would wedge
    the flow forever on a poisoned length prefix, since every batch
    would re-truncate back to the same stuck residual), and a zero
    length prefix (protocol violation, same wedge) clears it too.  Production deployments should add an idle-flow
    TTL (timeoutConf + state.hasTimedOut) sized to the capture's flow
    timeout; NoTimeout keeps the demo deterministic.

    Input: a streaming packet DataFrame (``readStream.format("pcap")``)
    with at least src/dst/src_port/dst_port/protocol/pkt_no/ts/payload.
    """
    import pandas as pd

    from ..operators.flows import _frame_messages
    from ..pcap import dns as _dns

    segments = packets.filter(
        (F.col("protocol") == "TCP")
        & ((F.col("src_port") == 53) | (F.col("dst_port") == 53))
        & F.col("payload").isNotNull()
        & (F.length("payload") > 0)
    ).select("src", "dst", "src_port", "dst_port", "ts", "pkt_no", "payload")

    def update(key, pdfs, state):
        residual, n_msgs, n_segs = (
            state.get if state.exists else (b"", 0, 0)
        )
        residual = bytes(residual or b"")
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts", "pkt_no"], kind="stable")
        n_segs += len(batch)
        stream = residual + b"".join(
            bytes(p) for p in batch["payload"] if p is not None
        )
        msgs = _frame_messages(stream)
        consumed = sum(2 + len(m) for m in msgs)
        residual = stream[consumed:]
        if len(residual) > max_flow_bytes:
            residual = b""  # hot-flow guard: reset, resync later
        if residual[:2] == b"\x00\x00":
            residual = b""  # zero-length prefix: unstick the flow
        rows = []
        for m in msgs:
            n_msgs += 1
            try:
                msg = _dns.parse_message(m)
            except Exception:
                continue  # silent-skip parity
            rows.append(
                {
                    "src": key[0], "dst": key[1],
                    "src_port": key[2], "dst_port": key[3],
                    "msg_no": n_msgs,
                    "dns_queryid": msg.query_id,
                    "dns_flags": msg.flags_text,
                    "dns_qr": msg.qr,
                    "dns_opcode": msg.opcode_text,
                    "dns_rcode": msg.rcode_text,
                    "dns_qname": msg.qname,
                    "dns_qtype": msg.qtype,
                    "dns_qtype_str": msg.qtype_text,
                    "dns_answer": msg.answers,
                    "dns_authority": msg.authority,
                    "dns_additional": msg.additional,
                    "n_segments": n_segs,
                }
            )
        state.update((residual, n_msgs, n_segs))
        if rows:
            yield pd.DataFrame(rows)

    return segments.groupBy("src", "dst", "src_port", "dst_port").applyInPandasWithState(
        update,
        outputStructType=DNS_TCP_OUTPUT,
        stateStructType=DNS_TCP_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_corpus_filter(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """The corpus build's streaming front half: Gopher-rule filter +
    PII scrub (both stateless maps) + exact dedup within the
    watermark (state bounded by watermark × arrival rate) — what you
    run on a live crawl before the batch near-dup/packing stages.

    Batch-equivalence: on any bounded input whose event times fit one
    watermark window, the kept set equals the batch pipeline's
    rules→scrub→exact-dedup stages (asserted in
    tests/test_streaming.py); near-dup needs cross-corpus state and
    stays batch (corpus_build_stats).

    Scale: rules/scrub ride the stream's map stage; the dedup state
    store holds one 128-bit fingerprint per surviving doc within the
    watermark — eviction is exactly the watermark contract."""
    from ..functions.text import exact_fingerprint, gopher_keep, scrub_pii

    cleaned = (
        docs.filter(gopher_keep(F.col(text_col)))
        .withColumn(text_col, scrub_pii(F.col(text_col)))
        .withColumn("fp", exact_fingerprint(F.col(text_col)))
    )
    return cleaned.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


# --- cross-run incremental dedup (snapshot-backed foreachBatch) ---------------
#
# dropDuplicatesWithinWatermark bounds its state by the watermark
# horizon — right for late/duplicate arrivals, wrong for the "daily
# crawl append" motif where today's batch must dedup against EVERY
# document ever kept.  That needs durable state outside the state
# store: a fingerprint snapshot on the data lake, anti-joined per
# micro-batch and appended to per epoch (the streaming twin of the
# batch `dedup_incremental` query, plans/pipeline.py).
#
# Exactly-once across crash/replay without a transactional store:
#   * each epoch's new fingerprints land in their own `epoch=<id>`
#     directory, written with mode=overwrite → replaying an epoch
#     rewrites the same directory instead of double-appending;
#   * the anti-join reads only STRICTLY EARLIER epochs, so a replay
#     sees exactly the pre-batch snapshot even if the crashed attempt
#     had already written its fingerprint directory;
#   * the within-batch representative is keep-min(id), not
#     dropDuplicates, so a replayed batch emits row-identical output.
#
# Scale: the snapshot is ONLY distinct 128-bit fingerprints — at
# 100 TB it lives as a bucketed table so the per-batch probe is a
# co-located join; epoch dirs are compacted offline
# (compact_fingerprint_snapshot) so file count stays bounded.

import re as _re

_EPOCH_RE = _re.compile(r"^epoch=(\d+)(?:c(\d+))?$")


def _snapshot_epoch_dirs(spark, fps_root: str) -> list:
    """List (epoch, compaction_generation, path) fingerprint
    partitions via the Hadoop FileSystem API — works on any
    filesystem Spark can reach (local, HDFS, object stores), where
    os.listdir only works on local paths."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(fps_root)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        m = _EPOCH_RE.match(status.getPath().getName())
        if m and status.isDirectory():
            out.append(
                (int(m.group(1)), int(m.group(2) or 0),
                 status.getPath().toString())
            )
    return out


def incremental_dedup_step(
    batch_df: DataFrame,
    epoch_id: int,
    snapshot_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fp",
    persist: bool = True,
) -> DataFrame:
    """One micro-batch of cross-run exact dedup: fingerprint, keep the
    min-``id_col`` representative per within-batch duplicate group,
    anti-join against every strictly-earlier epoch's fingerprints,
    and commit this epoch's survivors to ``<snapshot_dir>/fps/
    epoch=<id>`` (overwrite → replay-idempotent).  Returns the kept
    rows — PERSISTED when ``persist=True`` (the caller emits them
    downstream and unpersists); pass ``persist=False`` when nothing
    re-reads the result after the snapshot write (r14: caching a
    frame with exactly one consumer was pure memory-store overhead
    per epoch).

    Exposed separately from the stream wiring so the replay/restart
    semantics are testable without a streaming query."""
    from ..functions.text import exact_fingerprint

    spark = batch_df.sparkSession
    fps_root = snapshot_dir.rstrip("/") + "/fps"
    # keep-min(id) representative per fingerprint via min_by over ONE
    # hash aggregate (r14): map-side partial aggregation replaces the
    # former row_number window's full per-partition sort — same kept
    # rows (ids are a total order within a batch), one exchange either
    # way, no sort.
    data_cols = [c for c in batch_df.columns if c != fp_col]
    batch = (
        batch_df.withColumn(fp_col, exact_fingerprint(F.col(text_col)))
        .groupBy(fp_col)
        .agg(F.min_by(F.struct(*data_cols), F.col(id_col)).alias("_rep"))
        .select(
            *[F.col(f"_rep.{c}").alias(c) for c in data_cols], F.col(fp_col)
        )
    )
    prior = [
        p for e, _g, p in _snapshot_epoch_dirs(spark, fps_root) if e < epoch_id
    ]
    if prior:
        # explicit schema: immune to empty/partial dirs a crashed
        # compaction may leave (they contribute extra-or-missing rows,
        # both harmless: the originals survive until the compacted
        # write has committed, so the union is always a superset)
        seen = spark.read.schema(f"{fp_col} string").parquet(*prior)
        batch = batch.join(seen, [fp_col], "left_anti")
    kept = batch.persist() if persist else batch
    kept.select(fp_col).write.mode("overwrite").parquet(
        f"{fps_root}/epoch={epoch_id}"
    )
    return kept


def streaming_incremental_dedup(
    docs: DataFrame,
    snapshot_dir: str,
    emit=None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire :func:`incremental_dedup_step` into a foreachBatch sink.
    Returns a ``DataStreamWriter`` — the caller sets
    ``checkpointLocation`` and calls ``start()``.  ``emit(kept_df,
    epoch_id)`` receives each batch's survivors after the snapshot
    commit; per the standard foreachBatch contract it must itself be
    idempotent per epoch for end-to-end exactly-once.

    Single-writer contract: one stream owns a snapshot directory
    (epoch ids come from its checkpoint, and the strictly-earlier
    visibility rule assumes they are the only writers).  Concurrent
    crawls should dedup into per-stream snapshots and reconcile in a
    batch step, or share one stream via source union."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        # persist only when an emit callback will actually RE-READ the
        # kept frame after the snapshot write; with no emitter the
        # cache had exactly one consumer and was per-epoch overhead
        kept = incremental_dedup_step(
            batch_df, epoch_id, snapshot_dir, text_col=text_col,
            id_col=id_col, persist=emit is not None,
        )
        try:
            if emit is not None:
                emit(kept, epoch_id)
        finally:
            if emit is not None:
                kept.unpersist()

    return docs.writeStream.foreachBatch(_process)


def streaming_ann_screen(
    incoming: DataFrame,
    index,
    corpus: DataFrame,
    sink_dir: str,
    threshold: float = 0.99,
    k: int = 1,
    n_probe: int = 16,
    rerank_factor: int = 16,
    maintain_every: int = 0,
    recall_threshold: float = 0.8,
):
    """Screen a stream of NEW embedding vectors against a PERSISTED
    ANN index — the online arm of the crawl-ingest near-dup problem:
    "is this incoming document semantically already in the indexed
    corpus?".

    foreachBatch wiring (per-query top-k ranking is not expressible
    as a streaming aggregation): each micro-batch runs the SAME
    IVF+PQ search the batch path runs
    (operators/ann_index.py::cosine_topk_indexed) — zero training
    jobs, zero corpus re-encode; the frozen model routes the batch,
    the cell-bucketed codes table bounds the candidate bytes, the
    exact rerank touches only the shortlist — and appends one verdict
    row per incoming vector to ``sink_dir``:
    (vec_id, best_id, best_cos, is_neardup).

    Returns a ``DataStreamWriter``; the caller sets
    ``checkpointLocation`` and calls ``start()``.  Verdicts land in
    ``sink_dir/epoch=<id>/`` with per-epoch OVERWRITE, so a replayed
    epoch (crash after the write job committed but before the
    checkpoint commit) rewrites its own partition instead of
    appending duplicates — the idempotent-per-epoch contract
    foreachBatch requires of its sink (review r11 finding: a plain
    append would double rows on replay).  Readers of the sink root
    see an extra ``epoch`` partition column; select it away when only
    the verdicts matter.  At 100 TB the per-batch cost is
    O(batch × n_probe × corpus/n_cells) — batch times the probed
    CANDIDATE budget, with no training or corpus re-encode on the
    path; the budget is held flat as the corpus grows by scaling the
    index's n_cells with it (measured: tools/profile_state_scale.py
    --with-ann; at n_probe=16 of n_cells=32 the probed fraction is
    1/2 and per-query cost tracks the corpus — the knob matters).

    ``maintain_every=N`` (0 = off, the default) runs
    :func:`..operators.ann_index.maintain_ann_index` every N epochs
    with the EPOCH'S OWN batch as the recall probe — drift is measured
    exactly where it arrives (VERDICT r12 item 5): a degraded model
    retrains on a corpus-wide hash sample (so the drifted region
    informs the new centroids) and the screen continues on the
    replaced handle; a healthy-but-fragmented codes table compacts.
    The maintenance job is bounded (probe = n-queries × corpus
    brute pass; rebuild = the one encode pass appends amortize) and
    runs INSIDE the foreachBatch epoch, so the sink's idempotent
    per-epoch overwrite contract still holds on replay."""
    import os

    from ..operators.ann_index import cosine_topk_indexed, maintain_ann_index

    state = {"index": index, "epochs": 0}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        # persist the (batch-sized) query frame: _process executes it
        # three times — the emptiness probe, the bucket-prune replay's
        # collect, and the search plan itself — and without the cache
        # each execution re-reads the batch source (observed as
        # numInputRows over-counting in StreamingQueryProgress; for an
        # expensive upstream the re-read is real per-batch cost)
        batch_df = batch_df.persist()
        try:
            if not batch_df.head(1):
                return
            state["epochs"] += 1
            if maintain_every and state["epochs"] % maintain_every == 0:
                out = maintain_ann_index(
                    state["index"], corpus,
                    recall_threshold=recall_threshold,
                    queries=batch_df, k=k, n_probe=n_probe,
                    rerank_factor=rerank_factor,
                )
                state["index"] = out["index"]
            (
                cosine_topk_indexed(
                    state["index"], batch_df, corpus, k=k,
                    n_probe=n_probe, rerank_factor=rerank_factor,
                )
                .select(
                    F.col("q_id").alias("vec_id"),
                    F.col("n_id").alias("best_id"),
                    F.col("cos").alias("best_cos"),
                    (F.col("cos") >= threshold).alias("is_neardup"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(sink_dir, f"epoch={int(epoch_id)}"))
            )
        finally:
            batch_df.unpersist()

    return incoming.writeStream.foreachBatch(_process)


def compact_fingerprint_snapshot(spark, snapshot_dir: str, fp_col: str = "fp") -> int:
    """Offline snapshot housekeeping: fold every fingerprint epoch
    directory EXCEPT the newest into one ``epoch=<max-1>c<gen>``
    directory so the per-batch anti-join's file count stays bounded
    as epochs accumulate.  Run while the stream is stopped.

    The newest epoch is deliberately left unfolded: if the last batch
    crashed before its sink commit, restart REPLAYS that epoch, and
    the replay's anti-join reads only strictly-earlier epochs — a
    folded dir tagged with the replayed epoch's own id would vanish
    from its view.  Folding only ``< max`` keeps every possible
    replay's visible set byte-identical.

    Crash-safe by superset semantics: originals are deleted ONLY
    after the compacted write commits, and the anti-join is a set
    probe, so any crash leaves a state whose union equals the true
    fingerprint set (possibly with duplicates, which probe
    identically).  Returns the number of directories folded."""
    fps_root = snapshot_dir.rstrip("/") + "/fps"
    dirs = _snapshot_epoch_dirs(spark, fps_root)
    if not dirs:
        return 0
    top_epoch = max(e for e, _g, _p in dirs)
    fold = [(e, g, p) for e, g, p in dirs if e < top_epoch]
    if len(fold) <= 1:
        return 0
    next_gen = 1 + max(g for _e, g, _p in dirs)
    union = (
        spark.read.schema(f"{fp_col} string")
        .parquet(*[p for _e, _g, p in fold])
        .distinct()
    )
    union.write.mode("overwrite").parquet(
        f"{fps_root}/epoch={top_epoch - 1}c{next_gen}"
    )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for _e, _g, p in fold:
        hp = jvm.org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, True)
    return len(fold)
