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

from ..sources.warehouse import CommitConflictError, Warehouse


def _maybe_auto_compact(
    wh: Warehouse, ns: str, table: str,
    min_files: int, small_file_bytes: int,
) -> bool:
    """Post-commit auto-compaction (the Delta autoCompact analog):
    per-trigger streaming commits land one small file each, so without
    maintenance a long-running stream degrades every reader. The
    DECISION is metadata-only -- one manifest read, no data scan -- and
    fires only when some partition holds ``min_files`` or more files
    averaging under ``small_file_bytes``; the compaction itself reuses
    the ordinary :meth:`Warehouse.compact` bin-packing commit. A
    concurrent-commit conflict just skips this round (maintenance is
    best-effort; the next trigger re-checks)."""
    tdir = wh._table_dir(ns, table)
    doc = wh._manifest_doc(tdir, wh._versions(tdir)[-1])
    by_part: dict = {}
    for e in doc["files"]:
        by_part.setdefault(e.get("partition"), []).append(e)
    needs = any(
        len(es) >= min_files
        and (sum(x.get("bytes", 0) for x in es) / len(es)) < small_file_bytes
        for es in by_part.values()
    )
    if not needs:
        return False
    try:
        wh.compact(ns, table, min_files_per_partition=min_files)
        return True
    except CommitConflictError:
        return False


def read_table_stream(
    spark: SparkSession,
    wh: Warehouse,
    ns: str,
    table: str,
    from_version: int | None = None,
    skip_replace: bool = True,
    on_delete: str = "raise",
    max_versions_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a warehouse table (Iceberg streaming read):
    registers the warehouse-appends data source and returns the
    streaming DataFrame. ``from_version`` starts the stream AFTER that
    snapshot (exclusive); by default the stream begins at the table's
    creation, replaying all current rows in the first batch.
    ``max_versions_per_trigger`` (Iceberg
    streaming-max-files-per-micro-batch analog) bounds each micro-batch
    to at most N source commits -- a deep backlog drains in paced
    batches instead of one giant catch-up batch. Pacing is for
    CONTINUOUS triggers (processingTime): ``availableNow`` captures
    the reader's next offset ONCE at query start, so a paced
    availableNow run stops after at most N commits (scripts/
    stream_sweep.py drives paced drains with processingTime + stop-on-
    idle; leave pacing unset under availableNow)."""
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
    if max_versions_per_trigger is not None:
        reader = reader.option(
            "max_versions_per_trigger", str(max_versions_per_trigger)
        )
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
    mode: str = "merge",
    app_id: str | None = None,
    auto_compact: bool = False,
    auto_compact_min_files: int = 8,
    auto_compact_small_bytes: int = 32 << 20,
    refresh_mvs: list[str] | None = None,
    on_refresh=None,
    max_versions_per_trigger: int | None = None,
):
    """Tail ``src``'s append stream and write each micro-batch into
    ``dst`` (optionally through ``transform``, an arbitrary
    batch-DataFrame function -- filters, projections, enrichment
    joins). Returns the StreamingQuery. Both tables may live in the
    same warehouse or different ones (pass a Warehouse-bound method via
    functools.partial if so; this convenience signature uses one).

    Exactly-once, two shapes:
    - ``mode="merge"`` (default, needs a keyed destination): a
      replayed batch re-MERGEs the same keys -- idempotent by
      latest-wins.
    - ``mode="append"`` (keyless destination): each micro-batch
      commits with a Delta-style ``txn=(app_id, epoch)`` stamp riding
      the manifest, so a crash-replayed epoch is a provable no-op --
      the exactly-once KEYLESS sink (Spark's foreachBatch contract
      says epochs may re-fire; the stamp makes the re-fire free).
      ``app_id`` defaults to a checkpoint-derived stable id.

    ``on_delete="skip"`` streams past row-level-DML commits in the
    source by skipping such snapshots ENTIRELY -- rows they insert
    included (the Iceberg streaming-skip-delete/overwrite-snapshots
    posture; use ``Warehouse.changelog()`` in batch when every row of
    a mixed commit matters).

    ``auto_compact=True`` (Delta autoCompact analog) runs a
    threshold-gated bin-packing compaction after each micro-batch
    commit, bounding the destination's file count under continuous
    small-batch traffic; the check is metadata-only per trigger.

    ``refresh_mvs=["ns.mv", ...]`` refreshes the named materialized
    views after each micro-batch commit -- the continuously-fresh
    rollup: with ``mode="append"`` and a re-aggregable GROUP BY
    definition every per-batch refresh takes the aggregate-merge path
    (O(batch + groups), see sqlexec._mv_incremental_agg), so a
    dashboard MV tracks the stream at micro-batch latency without ever
    rescanning the table. ``mode="merge"`` commits are not appends --
    but with ``change_feed`` ON for the destination and a
    SUM/COUNT/AVG-only MV, each per-batch refresh takes the
    delete-folding merge path (``aggregate-merge-cdf``: changelog
    deletes fold as negative partials, O(changed rows + groups)) --
    the reference's whole CDC-upsert-then-rollup flow stays
    incremental end to end. Other shapes fall back to the
    always-correct full recompute.
    ``on_refresh(ref, status)`` (optional) observes each refresh --
    monitoring hooks assert the incremental path stayed engaged."""
    if mode not in ("merge", "append"):
        raise ValueError(f"unknown sink mode {mode!r}")
    stream = read_table_stream(
        spark, wh, *src, from_version=from_version, on_delete=on_delete,
        max_versions_per_trigger=max_versions_per_trigger,
    )
    dst_ns, dst_table = dst
    if app_id is None:
        import hashlib

        app_id = "stream-" + hashlib.md5(
            checkpoint_dir.encode()
        ).hexdigest()[:12]

    def sink(batch: DataFrame, epoch: int) -> None:
        if transform is not None:
            batch = transform(batch)
        if mode == "append":
            wh.insert(dst_ns, dst_table, batch, txn=(app_id, epoch))
        else:
            wh.merge_upsert(dst_ns, dst_table, batch, strategy=strategy)
        if auto_compact:
            _maybe_auto_compact(
                wh, dst_ns, dst_table,
                auto_compact_min_files, auto_compact_small_bytes,
            )
        if refresh_mvs:
            from ..sources.sqlexec import WarehouseSQL

            sql = WarehouseSQL(wh)
            for ref in refresh_mvs:
                st = sql.execute(f"REFRESH MATERIALIZED VIEW {ref}")
                if on_refresh is not None:
                    on_refresh(ref, st)

    trigger = trigger or {"availableNow": True}
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )


def stream_copy_into(
    spark: SparkSession,
    wh: Warehouse,
    landing_dir: str,
    dst: tuple[str, str],
    checkpoint_dir: str,
    fileformat: str = "parquet",
    schema=None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    app_id: str | None = None,
    auto_compact: bool = False,
    auto_compact_min_files: int = 8,
    auto_compact_small_bytes: int = 32 << 20,
):
    """Continuous COPY INTO (the Databricks Auto Loader shape): tail a
    landing DIRECTORY for new files and append each micro-batch into a
    warehouse table, exactly once. Returns the StreamingQuery.

    Spark-first: file discovery is Spark's native FileStreamSource --
    the checkpoint already persists the seen-file log, handles listing,
    and bounds per-trigger intake via ``maxFilesPerTrigger`` -- so this
    is a thin composition: readStream over the directory, the table's
    write validation (casts by name, column defaults, NOT NULL, CHECK
    constraints) inside the batch sink, and a Delta-style
    ``txn=(app_id, epoch)`` stamp riding each commit manifest so a
    crash-replayed epoch is a provable no-op (the exactly-once KEYLESS
    sink, same primitive as stream_table_to_table's append mode).

    Versus batch :meth:`Warehouse.copy_into`: the batch form keeps its
    ledger IN the table (re-runnable from anywhere, survives checkpoint
    loss); the streaming form keeps it in the Spark checkpoint (lower
    latency, bounded triggers, no per-run directory diff). Production
    lakes run the streaming form for the hot path and the batch form
    for backfills.

    ``schema``: required for formats Spark can't infer statically on a
    stream (csv/json); defaults to the DESTINATION table's schema,
    which is almost always what a landing zone contains.

    ``auto_compact=True``: as in :func:`stream_table_to_table` --
    per-trigger landing files stay bounded by threshold-gated
    post-commit compaction instead of accumulating one file per epoch.
    """
    from pyspark.sql.types import StructType as _ST

    dst_ns, dst_table = dst
    if schema is None:
        schema = _ST.fromJson(wh.table_meta(dst_ns, dst_table)["schema"])
    reader = spark.readStream.format(fileformat).schema(schema)
    if fileformat == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(landing_dir)
    if app_id is None:
        import hashlib

        app_id = "copy-" + hashlib.md5(
            checkpoint_dir.encode()
        ).hexdigest()[:12]

    def sink(batch: DataFrame, epoch: int) -> None:
        if transform is not None:
            batch = transform(batch)
        wh.insert(dst_ns, dst_table, batch, txn=(app_id, epoch))
        if auto_compact:
            _maybe_auto_compact(
                wh, dst_ns, dst_table,
                auto_compact_min_files, auto_compact_small_bytes,
            )

    trigger = trigger or {"availableNow": True}
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
