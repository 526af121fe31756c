"""WebDataset-style tar shards, stdlib only.

The de-facto packaging of large multimodal training corpora (LAION,
DataComp, most web-scale image/text sets) is the WebDataset
convention: plain POSIX tar shards whose members group into SAMPLES by
basename -- ``000000123.jpg`` + ``000000123.txt`` + ``000000123.json``
are one sample; a shard holds thousands; a corpus holds thousands of
shards. Plain tar is the whole trick: shards are sequentially
readable, splittable at the shard level, and writable by anything.
This module provides the shard writer/reader (stdlib ``tarfile`` over
in-memory bytes) and the sample grouping rule (key = basename up to
the FIRST dot, so ``x.seg.png`` keeps extension ``seg.png``), feeding
the from-scratch codecs for the member payloads.

Reference behavior re-expressed: opaque binary payload handling at
ingest; sharded sample packaging is the training-lake equivalent of
the reference's batched stream buffers (SURVEY.md north-star
extensions).
"""

from __future__ import annotations

import io
import tarfile


def encode_tar_shard(samples: dict[str, dict[str, bytes]]) -> bytes:
    """``{key: {ext: payload}}`` -> tar shard bytes. Members are laid
    out sample-contiguously in sorted key order (the WebDataset
    sequential-read contract: a sample's files are adjacent)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key in sorted(samples):
            for ext in sorted(samples[key]):
                data = samples[key][ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic shards
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def decode_tar_shard(payload: bytes) -> dict[str, dict[str, bytes]]:
    """Tar shard bytes -> ``{key: {ext: payload}}``. Grouping rule:
    key = basename up to the FIRST dot; everything after it is the
    extension (``a.seg.png`` -> key ``a``, ext ``seg.png``)."""
    out: dict[str, dict[str, bytes]] = {}
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            name = m.name.rsplit("/", 1)[-1]
            key, _, ext = name.partition(".")
            out.setdefault(key, {})[ext] = tf.extractfile(m).read()
    return out


def iter_samples(payload: bytes):
    """Yield ``(key, {ext: payload})`` in shard order -- the streaming
    read shape (a 100 TB corpus is read shard-sequentially per task,
    never materialized whole)."""
    current_key: str | None = None
    current: dict[str, bytes] = {}
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            name = m.name.rsplit("/", 1)[-1]
            key, _, ext = name.partition(".")
            if key != current_key and current_key is not None:
                yield current_key, current
                current = {}
            current_key = key
            current[ext] = tf.extractfile(m).read()
    if current_key is not None:
        yield current_key, current
