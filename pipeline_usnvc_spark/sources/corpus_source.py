"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
read a directory tree of raw ``.txt`` documents as a DataFrame.

This is the ingestion shape the reference's recursive directory scan
(reference usnvc/usnvc.py:41-62, stage-1 fan-out over export files)
implies, expressed as a first-class pluggable source instead of a
driver-side loop:

    spark.dataSource.register(TextCorpusDataSource)
    docs = (spark.read.format("textcorpus")
                 .option("path", "/data/crawl")
                 .option("partitions", "64")
                 .load())
    # -> (doc_id bigint, path string, text string, n_chars bigint)

Planning lists files ONCE on the driver (names only — no content),
assigns stable ``doc_id``s by sorted order, and round-robins files
into ``partitions`` input splits; executors read only their split's
files. That is the standard planning/execution split — the driver
never touches document bytes, so the source scales with file count,
not corpus size.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("path", StringType(), False),
        StructField("text", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


class _FilesPartition(InputPartition):
    def __init__(self, files: Sequence[tuple[int, str]]):
        self.files = list(files)


def _list_files(root: str, suffix: str) -> list[str]:
    """Sorted suffix-filtered recursive listing — the ONE directory
    walk shared by the batch and streaming readers (review finding:
    two copies could silently disagree on which files form the
    corpus)."""
    names: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(suffix):
                names.append(os.path.join(dirpath, fn))
    names.sort()
    return names


def _read_row(doc_id: int, path: str, encoding: str) -> tuple:
    """The ONE file-to-row contract: (doc_id, path, text, n_chars),
    with a vanished file yielding a null-text quarantine row rather
    than failing the task (the sources/jsonl.py pattern)."""
    try:
        with open(path, encoding=encoding, errors="replace") as f:
            text = f.read()
        return (doc_id, path, text, len(text))
    except OSError:
        return (doc_id, path, None, None)


class TextCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("textcorpus: option 'path' is required")
        self.n_partitions = int(options.get("partitions", "8"))
        self.suffix = options.get("suffix", ".txt")
        self.encoding = options.get("encoding", "utf-8")

    def partitions(self) -> Sequence[InputPartition]:
        # Driver-side planning: file NAMES only. Sorted for stable
        # doc_ids across runs; round-robin keeps splits balanced even
        # when directory order clusters large files together.
        indexed = list(enumerate(_list_files(self.root, self.suffix)))
        n = max(1, min(self.n_partitions, len(indexed) or 1))
        return [_FilesPartition(indexed[i::n]) for i in range(n)]

    def read(self, partition: _FilesPartition) -> Iterator[tuple]:
        for doc_id, path in partition.files:
            yield _read_row(doc_id, path, self.encoding)


class TextCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "textcorpus"

    def schema(self) -> StructType:
        return CORPUS_SCHEMA

    def reader(self, schema: StructType) -> TextCorpusReader:
        return TextCorpusReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "TextCorpusStreamReader":
        # Streaming variant defined below (directory-tailing source).
        return TextCorpusStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming variant (Spark 4 SimpleDataSourceStreamReader): tail the
# corpus directory — each microbatch picks up files that arrived
# since the last offset. The crawler-drop ingestion shape: writers
# drop finished .txt files into the tree; the stream emits each
# exactly once whatever order names arrive in (offsets carry the
# name -> doc_id assignment map, replayable via readBetweenOffsets).
#
# The Simple reader API reads on the DRIVER — appropriate here
# because each microbatch is the handful of newly arrived files, not
# the whole corpus (Spark buffers the batch to executors itself; for
# huge per-batch volumes the partition-planning streamReader API is
# the upgrade path).
# ---------------------------------------------------------------------------
from pyspark.sql.datasource import SimpleDataSourceStreamReader


class TextCorpusStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("textcorpus: option 'path' is required")
        self.suffix = options.get("suffix", ".txt")
        self.encoding = options.get("encoding", "utf-8")

    def _listing(self) -> list[str]:
        return _list_files(self.root, self.suffix)

    def _rows(self, files: list[tuple[int, str]]) -> list[tuple]:
        # Materialized list, not a generator: the streaming runner
        # shallow-copies its prefetch cache entries (datasource
        # internal getCache), and generators can't be copied. Each
        # batch is the handful of newly arrived files, so the list is
        # small by construction.
        return [_read_row(doc_id, path, self.encoding) for doc_id, path in files]

    def initialOffset(self) -> dict:
        # BOUNDARY: offsets grow with the total file count (the full
        # assignment map serializes into every checkpoint entry) —
        # right for directory tails up to ~10^5 files; beyond that the
        # upgrade path is an mtime watermark + bounded recent-name
        # set, which trades the out-of-order guarantee below for O(1)
        # offsets.
        # Offsets are the NAME -> doc_id assignment map, not a count:
        # positional offsets into a re-sorted listing would re-emit /
        # skip files whenever a late arrival sorts before an
        # already-processed name (crawler names are hash/url-derived,
        # not monotone). Name-keyed offsets make each file emit
        # exactly once regardless of arrival order, and pin its
        # doc_id for replay.
        return {"assigned": {}}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        assigned: dict[str, int] = dict(start.get("assigned", {}))
        fresh = [p for p in self._listing() if p not in assigned]
        next_id = len(assigned)
        new_files = [(next_id + i, p) for i, p in enumerate(fresh)]
        end_assigned = dict(assigned)
        for doc_id, p in new_files:
            end_assigned[p] = doc_id
        return iter(self._rows(new_files)), {"assigned": end_assigned}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Deterministic replay for recovery: ids come from the END
        # offset's assignment map, so a committed range re-reads to
        # identical rows whatever arrived since.
        prev = set(start.get("assigned", {}))
        files = sorted(
            ((doc_id, p) for p, doc_id in end.get("assigned", {}).items() if p not in prev)
        )
        return iter(self._rows(files))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: offsets are derived from the listing
