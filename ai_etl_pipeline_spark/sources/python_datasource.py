"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the distributed rendering of the reference's generator-style sources
(S8 LLM source, S7 REST batch source: ``/root/reference/translate.py``
drives both as driver-side loops).

``SyntheticDocsDataSource`` is a partitioned, deterministic document
generator: ``spark.read.format("synthetic_docs").option("n", N)
.option("partitions", P)`` yields N rows split across P independent
splits — each partition generates its own id range, so the source scales
horizontally like any file source (no driver materialization, no
single-generator bottleneck). The same skeleton is the template a real
deployment fills in with a paged-REST reader: one partition per page
range, throttled fetch inside ``read``.

Registration is explicit (``register_synthetic_docs(spark)``) — the
engine never auto-registers sources into a session it didn't build.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "data", "model", "train", "corpus", "sample", "the",
]


def _doc_text(i: int) -> str:
    h = hashlib.md5(f"synth|{i}".encode()).digest()
    n = 6 + h[0] % 10
    return " ".join(_WORDS[h[j % 16] % len(_WORDS)] for j in range(1, n + 1))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n // self.n_parts))
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, _doc_text(i), len(_doc_text(i)))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars int"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
