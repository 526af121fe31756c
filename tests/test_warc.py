"""WARC reader/writer + HTML text extraction (sources/warc.py):
record grammar, multi-member gzip framing, HTTP envelope filtering,
boilerplate-dropping extraction."""

from __future__ import annotations

import gzip

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.sources.warc import (
    decode_warc,
    encode_warc_gz,
    extract_text_records,
    html_to_text,
    http_response,
    parse_http_response,
    write_warc_record,
)

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



def _resp(html: str, uri: str = "http://x/", ct: str = "text/html") -> bytes:
    return write_warc_record(
        "response", http_response(html.encode(), content_type=ct),
        headers={"WARC-Target-URI": uri},
    )


def test_record_grammar_roundtrip_with_tricky_bodies():
    """Content-Length delimits blocks exactly: bodies containing things
    that LOOK like record boundaries must not split records."""
    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\ny"
    recs = [
        write_warc_record("warcinfo", b"software: t\r\n"),
        write_warc_record("resource", evil),
        write_warc_record("metadata", b""),
    ]
    got = decode_warc(b"".join(recs))
    assert [h["WARC-Type"] for h, _ in got] == [
        "warcinfo", "resource", "metadata"
    ]
    assert got[1][1] == evil
    assert got[2][1] == b""


def test_gzip_members_are_independent():
    """One gzip member per record (the splittability property): the
    archive decodes whole, AND any member decodes alone."""
    recs = [_resp("<p>one</p>"), _resp("<p>two</p>")]
    gz = encode_warc_gz(recs)
    assert len(decode_warc(gz)) == 2
    # find the second member boundary by decompressing the first
    import zlib

    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    d.decompress(gz)
    second = d.unused_data
    (h, _b), = decode_warc(second)
    assert h["WARC-Type"] == "response"
    # plain concatenated gzip also decodes via stdlib (sanity)
    assert gzip.decompress(gz)  # multi-member


def test_http_filtering():
    """Non-response records, non-200 statuses, and non-HTML content
    types are all skipped by the extraction stage."""
    not_found = write_warc_record(
        "response",
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone",
    )
    image = _resp("GIF89a...", ct="image/gif")
    req = write_warc_record("request", b"GET / HTTP/1.1\r\n\r\n")
    good = _resp("<p>hello world</p>", uri="http://keep/")
    out = extract_text_records(
        encode_warc_gz([not_found, image, req, good])
    )
    assert len(out) == 1
    assert out[0]["url"] == "http://keep/"
    assert out[0]["text"] == "hello world"


def test_html_extraction_drops_boilerplate_decodes_entities():
    html = (
        "<html><head><title>T &amp; T</title>"
        "<script>skip('me')</script><style>.x{}</style></head>"
        "<body><nav>Home</nav><article><p>café &lt;3 &amp; tea</p>"
        "<p>line two</p></article><footer>legal</footer></body></html>"
    )
    text, title = html_to_text(html)
    assert title == "T & T"
    assert text == "café <3 & tea line two"
    assert "skip" not in text and "Home" not in text and "legal" not in text


def test_parse_http_response():
    status, headers, body = parse_http_response(
        http_response(b"abc", content_type="text/plain")
    )
    assert status == 200
    assert headers["content-type"] == "text/plain"
    assert body == b"abc"


def test_bad_version_line_rejected():
    with pytest.raises(ValueError, match="version"):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")


# -- WebDataset tar shards (sources/webdataset.py) --


def test_webdataset_shard_roundtrip_and_grouping():
    from sample_for_transactional_datalake_using_s3tables_spark.sources.webdataset import (
        decode_tar_shard,
        encode_tar_shard,
        iter_samples,
    )

    samples = {
        "000000000001": {"txt": b"hello", "jpg": b"\xff\xd8fake",
                         "json": b"{}"},
        "000000000002": {"txt": b"world", "seg.png": b"\x89PNGfake"},
    }
    shard = encode_tar_shard(samples)
    assert decode_tar_shard(shard) == samples
    # multi-dot extensions keep everything after the FIRST dot
    got = dict(iter_samples(shard))
    assert got["000000000002"]["seg.png"] == b"\x89PNGfake"
    # sample-contiguous streaming order: keys arrive sorted
    assert list(got) == sorted(samples)
    # deterministic bytes (mtime pinned): same input, same shard
    assert encode_tar_shard(samples) == shard


def test_webdataset_empty_and_single():
    from sample_for_transactional_datalake_using_s3tables_spark.sources.webdataset import (
        decode_tar_shard,
        encode_tar_shard,
    )

    assert decode_tar_shard(encode_tar_shard({})) == {}
    one = {"k": {"txt": b""}}
    assert decode_tar_shard(encode_tar_shard(one)) == one
