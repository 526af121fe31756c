"""WARC (Web ARChive) reader/writer + HTML text extraction, stdlib
only.

WARC is THE web-scale training-corpus container (Common Crawl ships
petabytes of ``.warc.gz``): ISO 28500 records -- a version line,
named headers, Content-Length-delimited block -- each gzip'd as its
OWN member so readers can split archives at member boundaries (the
property that makes a 100 TB crawl splittable across executors). This
module implements the record grammar, the multi-member gzip framing,
HTTP response-envelope parsing, and a boilerplate-dropping HTML ->
text extractor (stdlib ``html.parser``) -- the first stage of every
web-corpus curation pipeline, feeding the text battery
(operators/text.py) and dedup (operators/dedup.py).

Reference behavior re-expressed: the reference ingests opaque payloads
from a stream; a training-data lake's equivalent bulk source is the
web crawl (SURVEY.md north-star extensions).
"""

from __future__ import annotations

import gzip
import io
import uuid
import zlib
from html import unescape
from html.parser import HTMLParser


def write_warc_record(
    kind: str,
    body: bytes,
    headers: dict[str, str] | None = None,
    record_id: str | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record: version line, headers (always
    including WARC-Type / WARC-Record-ID / Content-Length), the block,
    and the mandatory blank-line record terminator."""
    rid = record_id or f"<urn:uuid:{uuid.uuid4()}>"
    h = {
        "WARC-Type": kind,
        "WARC-Record-ID": rid,
        "WARC-Date": "2026-01-01T00:00:00Z",
        **(headers or {}),
        "Content-Length": str(len(body)),
    }
    head = "WARC/1.0\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in h.items()
    )
    return head.encode() + b"\r\n" + body + b"\r\n\r\n"


def http_response(body: bytes, content_type: str = "text/html") -> bytes:
    """An HTTP response envelope (the block of a WARC 'response'
    record)."""
    return (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
        + body
    )


def encode_warc_gz(records: list[bytes]) -> bytes:
    """Compress records as a standard ``.warc.gz``: one gzip MEMBER per
    record (ISO 28500 annex; what makes the archive splittable)."""
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec))
    return out.getvalue()


def decode_warc(payload: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse a WARC archive (gzip multi-member or plain) into
    ``(headers, block)`` records. Content-Length delimits each block
    exactly -- bodies may contain anything, including things that look
    like record boundaries."""
    if payload[:2] == b"\x1f\x8b":
        # decompress ALL members (zlib stops per member; loop)
        buf = bytearray()
        pos = 0
        while pos < len(payload):
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            buf += d.decompress(payload[pos:])
            rest = d.unused_data
            if not rest:
                break
            pos = len(payload) - len(rest)
        payload = bytes(buf)
    records = []
    pos = 0
    while pos < len(payload):
        # skip inter-record blank lines
        while payload[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(payload):
            break
        end = payload.index(b"\r\n\r\n", pos)
        head = payload[pos:end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {head[0]!r}")
        headers: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        n = int(headers["Content-Length"])
        body = payload[end + 4:end + 4 + n]
        records.append((headers, body))
        pos = end + 4 + n
    return records


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of an HTTP response block."""
    end = block.index(b"\r\n\r\n")
    lines = block[:end].decode("utf-8", "replace").split("\r\n")
    status = int(lines[0].split()[1])
    headers = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[end + 4:]


# tags whose CONTENT is boilerplate, not corpus text
_DROP_CONTENT = {"script", "style", "noscript", "template", "head",
                 "nav", "footer", "aside"}
_BLOCK_TAGS = {"p", "div", "br", "li", "tr", "h1", "h2", "h3", "h4",
               "h5", "h6", "section", "article"}


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self._drop = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_CONTENT:
            self._drop += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _DROP_CONTENT and self._drop:
            self._drop -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif not self._drop:
            self.parts.append(data)


def html_to_text(html: str) -> tuple[str, str]:
    """(text, title): tag-stripped, entity-decoded visible text with
    script/style/nav/footer boilerplate dropped and whitespace
    normalized -- the extraction stage of a web-corpus pipeline."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    text = " ".join("".join(p.parts).split())
    title = " ".join("".join(p.title_parts).split())
    return text, title


def extract_text_records(payload: bytes) -> list[dict]:
    """One-call pipeline stage: WARC archive -> list of
    ``{url, title, text, status}`` for every 200 text/html response
    record (the shape a curation pipeline lands in a documents
    table)."""
    out = []
    for headers, block in decode_warc(payload):
        if headers.get("WARC-Type") != "response":
            continue
        status, http_headers, body = parse_http_response(block)
        if status != 200:
            continue
        if "text/html" not in http_headers.get("content-type", ""):
            continue
        text, title = html_to_text(body.decode("utf-8", "replace"))
        out.append(
            {
                "url": headers.get("WARC-Target-URI", ""),
                "title": title,
                "text": text,
                "status": status,
            }
        )
    return out
