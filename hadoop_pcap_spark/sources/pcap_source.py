"""PCAP → DataFrame source, Spark-first.

Replaces the reference's `PcapInputFormat` / `CombinePcapInputFormat` /
`PcapRecordReader` / Hive `PcapDeserializer` stack
(hadoop-pcap-lib/.../io/PcapInputFormat.java:28-75,
io/reader/PcapRecordReader.java:16-77, hadoop-pcap-serde/.../
PcapDeserializer.java:21-66) with two Spark-native paths:

1. ``read_pcap(spark, path, ...)`` — ``binaryFile`` scan (one row per
   file; pcap is unsplittable, same constraint as the reference's
   ``isSplitable → false``) followed by a columnar decode into a fixed
   wide schema (``mapInArrow`` by default, ``mapInPandas`` via
   ``engine='pandas'``).  Spark's ``spark.sql.files.maxPartitionBytes``
   / ``openCostInBytes`` give the small-file packing that
   `CombinePcapInputFormat` hand-rolled.

2. a registered Python DataSource (``spark.read.format("pcap")`` /
   ``CREATE TABLE ... USING pcap``) — see :mod:`.datasource`.

Scale design (100 TB): the decode is embarrassingly parallel per file
(one task per file, Arrow batches out); the recommended pipeline is
decode-once → write Parquet partitioned by capture date → query many
times with full pushdown.  Column pruning is pushed *into* the decoder
via ``columns=`` (skips MD5 / DNS / payload work when those columns
aren't requested), mirroring the reference's conditional-decode
laziness (L4 only for TCP/UDP, L7 only on port 53, MD5 only if
configured).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pcap.decode import DecodeOptions, decode_pcap

# --- the wide packet schema (SURVEY.md §1.5; FIXTURES.md §1-2) ---------------

BASE_FIELDS: List[T.StructField] = [
    T.StructField("file", T.StringType(), True),
    T.StructField("pkt_no", T.LongType(), False),
    T.StructField("ts", T.LongType(), True),
    # ts_usec: the reference drops sub-second precision (PcapReader.java:25,
    # 174 reads only ts_sec); Spark can carry it, so we expose it.
    T.StructField("ts_usec", T.LongType(), True),
    T.StructField("size", T.LongType(), True),
    T.StructField("md5", T.StringType(), True),
    T.StructField("ether_type", T.StringType(), True),
    T.StructField("ttl", T.IntegerType(), True),
    T.StructField("protocol", T.StringType(), True),
    T.StructField("src", T.StringType(), True),
    T.StructField("dst", T.StringType(), True),
    T.StructField("src_port", T.IntegerType(), True),
    T.StructField("dst_port", T.IntegerType(), True),
    T.StructField("len", T.IntegerType(), True),
    T.StructField("udpsum", T.IntegerType(), True),
    T.StructField("payload_len", T.IntegerType(), True),
    T.StructField("frag", T.BooleanType(), True),
    T.StructField("ext_count", T.IntegerType(), True),
    T.StructField("ext_headers", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
]

DNS_FIELDS: List[T.StructField] = [
    T.StructField("dns_queryid", T.IntegerType(), True),
    T.StructField("dns_flags", T.StringType(), True),
    T.StructField("dns_qr", T.BooleanType(), True),
    T.StructField("dns_opcode", T.StringType(), True),
    T.StructField("dns_rcode", T.StringType(), True),
    T.StructField("dns_qname", T.StringType(), True),
    T.StructField("dns_qtype", T.IntegerType(), True),
    T.StructField("dns_qtype_str", T.StringType(), True),
    T.StructField("dns_answer", T.ArrayType(T.StringType()), True),
    T.StructField("dns_authority", T.ArrayType(T.StringType()), True),
    T.StructField("dns_additional", T.ArrayType(T.StringType()), True),
]

PACKET_SCHEMA = T.StructType(BASE_FIELDS)
DNS_PACKET_SCHEMA = T.StructType(BASE_FIELDS + DNS_FIELDS)


def packet_schema(decoder: str = "ip", columns: Optional[Iterable[str]] = None) -> T.StructType:
    full = DNS_PACKET_SCHEMA if decoder == "dns" else PACKET_SCHEMA
    if columns is None:
        return full
    wanted = set(columns)
    return T.StructType([f for f in full.fields if f.name in wanted])


def decode_files_to_frames(
    file_rows: Iterable[tuple],
    schema: T.StructType,
    opts: DecodeOptions,
    batch_rows: int = 8192,
) -> Iterator[pd.DataFrame]:
    """(path, bytes) pairs → pandas frames matching ``schema``.

    Shared by the mapInPandas path and the DataSource V2 reader.
    Missing keys become None → NULL, mirroring the Hive SerDe's
    missing-key→NULL projection (PcapDeserializer.java:50-60).
    """
    names = [f.name for f in schema.fields]
    buf: List[dict] = []
    for path, data in file_rows:
        for pkt in decode_pcap(data, name=path, opts=opts):
            pkt["file"] = path
            buf.append(pkt)
            if len(buf) >= batch_rows:
                yield pd.DataFrame(
                    {n: [row.get(n) for row in buf] for n in names}
                )
                buf = []
    if buf:
        yield pd.DataFrame({n: [row.get(n) for row in buf] for n in names})


def decode_files_to_arrow(
    file_rows: Iterable[tuple],
    schema: T.StructType,
    opts: DecodeOptions,
    batch_rows: int = 8192,
):
    """(path, bytes) pairs → pyarrow RecordBatches (columnar, no
    pandas detour — measurably faster than the pandas path for the
    string-heavy packet schema)."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    names = [f.name for f in schema.fields]
    cols = {n: [] for n in names}
    count = 0
    for path, data in file_rows:
        for pkt in decode_pcap(data, name=path, opts=opts):
            pkt["file"] = path
            for n in names:
                cols[n].append(pkt.get(n))
            count += 1
            if count >= batch_rows:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(cols[n], type=arrow_schema.field(n).type) for n in names],
                    schema=arrow_schema,
                )
                cols = {n: [] for n in names}
                count = 0
    if count:
        yield pa.RecordBatch.from_arrays(
            [pa.array(cols[n], type=arrow_schema.field(n).type) for n in names],
            schema=arrow_schema,
        )


def decode_files_to_arrow_columnar(
    file_rows: Iterable[tuple],
    schema: T.StructType,
    opts: DecodeOptions,
    batch_rows: int = 65536,
):
    """(path, bytes) pairs → pyarrow RecordBatches via the vectorized
    columnar kernel (:mod:`..pcap.decode_np`): whole-file numpy column
    extraction, then zero-copy-ish Arrow construction (numeric columns
    hand over the ndarray + null mask directly).  ~3.5× the scalar
    kernel's packets/s/core — at 100 TB the decode IS the job, so this
    is the default ``read_pcap`` path."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from ..pcap.decode_np import decode_pcap_columnar

    import numpy as np

    arrow_schema = to_arrow_schema(schema)
    names = [f.name for f in schema.fields]
    for path, data in file_rows:
        res = decode_pcap_columnar(data, name=path, opts=opts)
        for s0 in range(0, res.n, batch_rows):
            s1 = min(s0 + batch_rows, res.n)
            arrays = []
            for n in names:
                t = arrow_schema.field(n).type
                if n == "file":
                    arrays.append(pa.array([path] * (s1 - s0), type=t))
                elif n in res.numeric:
                    vals, mask = res.numeric[n]
                    arrays.append(pa.array(vals[s0:s1], type=t, mask=mask[s0:s1]))
                elif n == "payload":
                    arrays.append(
                        _payload_arrow(res, s0, s1, np, pa)
                        if res.emit_payload
                        else pa.nulls(s1 - s0, type=t)
                    )
                else:
                    arrays.append(
                        pa.array(res.objects[n][s0:s1], type=t, from_pandas=True)
                    )
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


def _payload_arrow(res, s0: int, s1: int, np, pa):
    """Payload column as BinaryArray.from_buffers: fast-path rows are
    gathered from the file buffer in ONE vectorized pass (no per-row
    Python bytes), slow-path (scalar-fallback) rows copy their bytes
    in.  ~20% off whole-file decode vs per-row slicing."""
    k = s1 - s0
    starts_all, lens_all, has_all = res.payload_spans
    m = len(has_all)
    u = np.frombuffer(res.data, dtype=np.uint8)
    objs = res.objects["payload"][s0:s1]
    obj_mask = objs != None  # noqa: E711

    lens = np.zeros(k, dtype=np.int64)
    valid = np.zeros(k, dtype=bool)
    span_rows = np.zeros(k, dtype=bool)
    in_span = min(max(m - s0, 0), k)  # rows of this slice covered by spans
    if in_span > 0:
        sl = slice(s0, s0 + in_span)
        span_rows[:in_span] = has_all[sl]
        lens[:in_span] = np.where(has_all[sl], lens_all[sl], 0)
        valid[:in_span] = has_all[sl]
    span_rows &= ~obj_mask
    for i in np.nonzero(obj_mask)[0].tolist():
        lens[i] = len(objs[i])
        valid[i] = True

    total_bytes = int(lens.sum())
    if total_bytes > 2**31 - 1:  # 32-bit Arrow binary offsets
        return pa.array(
            [res.payload_at(s0 + i) for i in range(k)], type=pa.binary()
        )
    offsets = np.zeros(k + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    buf = np.empty(total_bytes, dtype=np.uint8)
    sr = np.nonzero(span_rows)[0]
    if len(sr):
        starts = starts_all[s0 + sr]
        slens = lens[sr]
        # positions: for each span row, starts[j] + [0..len) laid out at
        # its offset — one big fancy-index gather
        total = int(slens.sum())
        if total:
            rel = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(slens[:-1]))), slens
            )
            src = np.repeat(starts, slens) + rel
            if not obj_mask.any():
                # span chunks tile buf contiguously (zero-length rows
                # don't perturb offsets) → pure gather, no scatter
                buf[:total] = u[src]
            else:
                dst = np.repeat(offsets[sr], slens) + rel
                buf[dst] = u[src]
    for i in np.nonzero(obj_mask)[0].tolist():
        o = offsets[i]
        buf[o : o + lens[i]] = np.frombuffer(objs[i], dtype=np.uint8)

    validity = pa.array(valid).buffers()[1]
    return pa.Array.from_buffers(
        pa.binary(),
        k,
        [validity, pa.py_buffer(offsets), pa.py_buffer(buf)],
        null_count=int((~valid).sum()),
    )


def read_pcap(
    spark: SparkSession,
    path: str,
    decoder: str = "ip",
    calculate_md5: bool = False,
    keep_payload: bool = True,
    strict_reference: bool = True,
    mode: str = "FAILFAST",
    columns: Optional[Iterable[str]] = None,
    path_glob: Optional[str] = None,
    engine: str = "arrow",
) -> DataFrame:
    """Read pcap file(s) into a typed DataFrame.

    The reference's pluggable-reader conf
    (``net.ripe.hadoop.pcap.io.reader.class``) becomes the ``decoder``
    argument; ``calculateMD5`` becomes ``calculate_md5``.
    ``engine='arrow'`` (default) runs the vectorized columnar kernel
    and builds Arrow batches directly (mapInArrow);
    ``'arrow-scalar'`` keeps the per-packet kernel behind the same
    Arrow plumbing (cross-check path); ``'pandas'`` the mapInPandas
    path.
    """
    if engine not in ("arrow", "arrow-scalar", "pandas"):
        raise ValueError(
            f"engine must be 'arrow', 'arrow-scalar' or 'pandas', got {engine!r}"
        )
    schema = packet_schema(decoder, columns)
    wanted = set(f.name for f in schema.fields) if columns is not None else None
    opts = DecodeOptions(
        decoder=decoder,
        calculate_md5=calculate_md5,
        keep_payload=keep_payload,
        strict_reference=strict_reference,
        mode=mode,
        wanted=wanted,
    )

    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")

    if engine in ("arrow", "arrow-scalar"):
        to_batches = (
            decode_files_to_arrow_columnar
            if engine == "arrow"
            else decode_files_to_arrow
        )

        def decode_partition_arrow(batches):
            def gen():
                for rb in batches:
                    paths = rb.column(0).to_pylist()
                    contents = rb.column(1).to_pylist()
                    yield from zip(paths, contents)

            yield from to_batches(gen(), schema, opts)

        return files.mapInArrow(decode_partition_arrow, schema)

    def decode_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def gen():
            for pdf in it:
                yield from zip(pdf["path"], pdf["content"])
        yield from decode_files_to_frames(gen(), schema, opts)

    return files.mapInPandas(decode_partition, schema)


def write_packets_parquet(
    df: DataFrame,
    out_path: str,
    partition_by: Optional[List[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Decode-once → Parquet, the 100 TB pattern.

    Adds a ``capture_date`` partition column derived from ``ts`` when
    ``partition_by`` is not given, so downstream queries get partition
    pruning on time predicates.
    """
    if partition_by is None:
        df = df.withColumn("capture_date", F.to_date(F.timestamp_seconds(F.col("ts"))))
        partition_by = ["capture_date"]
    df.write.mode(mode).partitionBy(*partition_by).parquet(out_path)
