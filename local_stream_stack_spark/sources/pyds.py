"""Custom connector via the Spark 4 Python DataSource API.

The reference's distinctive surface is a CONNECTOR ABSTRACTION — a
class that owns source options and hands the pipeline a DataFrame
(``/root/reference/pyspark_stream/connectors/kafka_connector.py:11-189``).
Spark 4 made that abstraction a first-class extension point for pure
Python: subclass ``DataSource``/``DataSourceReader``, register, and
``spark.read.format(name)`` plans a parallel scan whose partitions
execute in Python workers (Arrow-batched back to the JVM).

``DeterministicEventsSource`` is the in-repo connector built on it: a
seedless synthetic event generator whose every cell is a pure integer
function of the row id, so any slice is reproducible on any engine —
the test/backfill fixture pattern (a "generate 10^12 rows of realistic
events" source needs no upstream system and shards perfectly).

Scale shape: ``partitions()`` returns one ``InputPartition`` per
requested shard; each worker generates ONLY its id range (no skew, no
coordination, no driver materialization). Filters/limits still apply
after the scan; a production connector would implement
``pushFilters`` to prune shards — the hook exists on the same class.

The Python-worker path is the honest cost: rows cross into the JVM
via Arrow batches. Use it for connector extensibility, never to
re-implement an operator the JVM already has.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Knuth's multiplicative hash constant: k = (id * A) mod 2^32 gives a
# full-period integer scramble both engines can mirror exactly.
_A = 2654435761
_M = 4294967296


class DeterministicEventsSource(DataSource):
    """``spark.read.format("lss_synthetic")`` — options:

    - ``n_rows`` (default 100000): total rows across all partitions
    - ``n_parts`` (default 8): number of input partitions (shards)
    - ``n_buckets`` (default 10): cardinality of the bucket column

    Schema: ``id bigint, bucket int, k bigint`` where
    ``k = (id * 2654435761) % 2^32`` (derive a unit double as
    ``k / 2^32`` downstream — kept integer here so aggregates stay
    exact).
    """

    @classmethod
    def name(cls) -> str:
        return "lss_synthetic"

    def schema(self) -> str:
        return "id bigint, bucket int, k bigint"

    def reader(self, schema) -> "DeterministicEventsReader":
        return DeterministicEventsReader(self.options)

    def simpleStreamReader(
        self, schema
    ) -> "DeterministicEventsStreamReader":
        return DeterministicEventsStreamReader(self.options)


class DeterministicEventsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_parts = int(options.get("n_parts", 8))
        self.n_buckets = int(options.get("n_buckets", 10))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # contiguous id range per shard: worker i owns [lo, hi)
        per = -(-self.n_rows // self.n_parts)  # ceil division
        lo = partition.value * per
        hi = min(lo + per, self.n_rows)
        for i in range(lo, hi):
            yield (i, i % self.n_buckets, (i * _A) % _M)


class DeterministicEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same connector
    (``spark.readStream.format("lss_synthetic")``): offsets are plain
    row ids, each micro-batch serves ``rows_per_batch`` ids from the
    cursor, and the generator is the identical pure function of id —
    so a drained stream equals the batch read row-for-row and the SAME
    oracle checks both. ``n_rows`` bounds the stream (latest offset
    stops advancing), which makes ``processAllAvailable`` a
    deterministic drain — the reference's bounded-replay test pattern
    (`kafka_connector.py` batch mode with ending offsets) without a
    broker. Exactly-once comes from offset-range replay:
    ``readBetweenOffsets`` regenerates any range bit-identically, the
    strongest replayability a source can offer."""

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_buckets = int(options.get("n_buckets", 10))
        self.rows_per_batch = int(options.get("rows_per_batch", 10_000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _gen(self, lo: int, hi: int) -> Iterator[tuple]:
        # iter(list), NOT a generator: the prefetch cache copies and
        # pickles the iterator for replay (datasource_internal.py
        # getCache), which list iterators support and generators don't
        return iter(
            [(i, i % self.n_buckets, (i * _A) % _M) for i in range(lo, hi)]
        )

    def read(self, start: dict) -> tuple:
        lo = int(start["next"])
        hi = min(lo + self.rows_per_batch, self.n_rows)
        return self._gen(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._gen(int(start["next"]), int(end["next"]))


def register(spark) -> None:
    """Idempotently register the connector on this session.

    The reader classes are marked for BY-VALUE cloudpickle
    serialization: Spark's Python data source runners unpickle them in
    worker processes whose sys.path does not include the driver-side
    package (the addPyFile zip covers ordinary UDF workers but not the
    streaming source runner), so a by-reference pickle would die with
    ModuleNotFoundError under the external driver's session. By-value
    ships the class definitions inside the pickle itself — the
    connector is self-contained wherever it lands."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(DeterministicEventsSource)
