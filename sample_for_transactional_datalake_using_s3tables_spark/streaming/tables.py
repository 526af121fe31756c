"""Table-to-table streaming: chain pipelines off the transactional
lake itself.

The reference ingests a CDC stream INTO the table (stack/firehose.py);
the downstream half of that architecture -- consumers that tail the
table and feed derived tables -- is what ``stream_table_to_table``
provides: the medallion bronze -> silver hop with exactly-once
semantics end to end. The source is the warehouse-appends Python Data
Source (sources/streamsource.py): offsets are manifest versions stored
in the streaming checkpoint, and every replayed range is deterministic
because snapshots are immutable. The sink is a keyed MERGE per
micro-batch, so replays after a crash are idempotent (latest-wins on
the key) rather than duplicating rows.

At 100 TB the shape matters: each trigger plans its batch from
manifest diffs (metadata-only), scans ONLY the files appended since
the last checkpointed version, and commits O(batch) -- with
``strategy="mor"``, zero existing files are read or rewritten per
trigger.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.warehouse import Warehouse


def read_table_stream(
    spark: SparkSession,
    wh: Warehouse,
    ns: str,
    table: str,
    from_version: int | None = None,
    skip_replace: bool = True,
    on_delete: str = "raise",
) -> DataFrame:
    """``readStream`` over a warehouse table (Iceberg streaming read):
    registers the warehouse-appends data source and returns the
    streaming DataFrame. ``from_version`` starts the stream AFTER that
    snapshot (exclusive); by default the stream begins at the table's
    creation, replaying all current rows in the first batch."""
    from ..sources.streamsource import WarehouseAppendsDataSource

    spark.dataSource.register(WarehouseAppendsDataSource)
    reader = (
        spark.readStream.format("warehouse_appends")
        .option("root", wh.root)
        .option("ns", ns)
        .option("table", table)
        .option("skip_replace", str(skip_replace).lower())
        .option("on_delete", on_delete)
    )
    if from_version is not None:
        reader = reader.option("from_version", str(from_version))
    return reader.load()


def stream_table_to_table(
    spark: SparkSession,
    wh: Warehouse,
    src: tuple[str, str],
    dst: tuple[str, str],
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger: dict | None = None,
    strategy: str = "cow",
    from_version: int | None = None,
    on_delete: str = "raise",
):
    """Tail ``src``'s append stream and MERGE each micro-batch into
    ``dst`` (optionally through ``transform``, an arbitrary
    batch-DataFrame function -- filters, projections, enrichment
    joins). Returns the StreamingQuery. Both tables may live in the
    same warehouse or different ones (pass a Warehouse-bound method via
    functools.partial if so; this convenience signature uses one).

    Exactly-once: the checkpoint pins the last consumed manifest
    version; a replayed batch re-MERGEs the same keys, which is
    idempotent for a keyed destination. ``on_delete="skip"`` streams
    past row-level-DML commits in the source (insert-only downstream;
    the Iceberg streaming-skip-delete-snapshots posture)."""
    stream = read_table_stream(
        spark, wh, *src, from_version=from_version, on_delete=on_delete
    )
    dst_ns, dst_table = dst

    def sink(batch: DataFrame, _epoch: int) -> None:
        if transform is not None:
            batch = transform(batch)
        wh.merge_upsert(dst_ns, dst_table, batch, strategy=strategy)

    trigger = trigger or {"availableNow": True}
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
