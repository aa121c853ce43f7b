"""Python DataSource V2: ``spark.read.format("pcap")``.

Spark 4's Python DataSource API
(pyspark.sql.datasource.DataSource) gives the SQL-surface parity the
reference achieved with ``STORED AS INPUTFORMAT 'net.ripe.hadoop.pcap
.io.PcapInputFormat'`` + the Hive SerDe (hadoop-pcap-serde/README.md:
23-44): after ``register_pcap_datasource(spark)`` you can

    spark.read.format("pcap").option("decoder", "dns").load("/caps/*.pcap")
    CREATE TABLE pcaps USING pcap OPTIONS (path '/caps', decoder 'dns')

Partitioning: one InputPartition per file — the same parallelism grain
as the reference (pcap is unsplittable, io/PcapInputFormat.java:72-75).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from ..pcap.decode import DecodeOptions, decode_pcap
from .pcap_source import packet_schema


def _expand_paths(path: str) -> List[str]:
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in files)
        return sorted(out)
    matches = sorted(glob.glob(path))
    return matches if matches else [path]


class _PcapFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PcapDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._options = options

    def partitions(self) -> List[InputPartition]:
        path = self._options.get("path")
        if not path:
            raise ValueError("pcap datasource requires a path")
        return [_PcapFilePartition(p) for p in _expand_paths(path)]

    def read(self, partition: _PcapFilePartition) -> Iterator[tuple]:
        opts = DecodeOptions(
            decoder=self._options.get("decoder", "ip"),
            calculate_md5=str(self._options.get("calculatemd5", "false")).lower()
            == "true",
            keep_payload=str(self._options.get("keeppayload", "true")).lower()
            == "true",
            strict_reference=str(
                self._options.get("strictreference", "true")
            ).lower()
            == "true",
            mode=self._options.get("mode", "FAILFAST"),
        )
        names = [f.name for f in self._schema.fields]
        with open(partition.path, "rb") as f:
            data = f.read()
        for pkt in decode_pcap(data, name=partition.path, opts=opts):
            pkt["file"] = partition.path
            yield tuple(pkt.get(n) for n in names)


class PcapDataSource(DataSource):
    """``format("pcap")`` — typed packet rows straight from capture files."""

    @classmethod
    def name(cls) -> str:
        return "pcap"

    def schema(self) -> StructType:
        return packet_schema(self.options.get("decoder", "ip"))

    def reader(self, schema: StructType) -> PcapDataSourceReader:
        return PcapDataSourceReader(schema, dict(self.options))


def register_pcap_datasource(spark) -> None:
    spark.dataSource.register(PcapDataSource)
