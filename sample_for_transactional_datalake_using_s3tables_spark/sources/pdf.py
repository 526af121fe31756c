"""Minimal PDF writer + text extractor, stdlib only.

PDF is the other big document-corpus container (alongside WARC): a
training pipeline's document-ingestion stage must pull text out of
it. This module implements the subset that covers straightforwardly
generated text PDFs -- the object grammar (``N 0 obj .. endobj``),
Flate-compressed content streams (stdlib zlib), the page tree, and
the text-showing operators ``Tj`` / ``'`` / ``TJ`` (with PDF string
escapes and octal sequences) -- plus a deterministic writer so the
whole chain is exactly invertible and oracle-certifiable. Scanned
(image-only) PDFs need OCR and encrypted PDFs need crypto -- both
raise as the documented seam.
"""

from __future__ import annotations

import re
import zlib


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_pdf(pages: list[str], compress: bool = True) -> bytes:
    """One content page per entry (text lines split on ``\\n``, drawn
    top-down in Helvetica 12). Deterministic output: a fixed object
    layout with a correct xref table."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    content_ids = []
    for text in pages:
        ops = ["BT /F1 12 Tf 72 720 Td 14 TL"]
        for i, line in enumerate(text.split("\n")):
            ops.append(f"({_esc(line)}) {'Tj' if i == 0 else chr(39)}")
        ops.append("ET")
        # PDF string literals are BYTE strings; latin-1 both ways keeps
        # the writer/extractor pair exactly inverse for the 8-bit range
        stream = "\n".join(ops).encode("latin-1")
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Filter /FlateDecode /Length %d >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        content_ids.append(
            add(head + b"\nstream\n" + stream + b"\nendstream")
        )
    pages_id = len(objs) + len(pages) + 1
    page_ids = []
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >> >> "
                b"/Contents %d 0 R >>" % (pages_id, font, cid)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    ) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_off)
    )
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _unescape(s: bytes) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i:i + 1]
        if c != b"\\":
            out.append(c)
            i += 1
            continue
        n = s[i + 1:i + 2]
        if n in (b"(", b")", b"\\"):
            out.append(n)
            i += 2
        elif n == b"n":
            out.append(b"\n")
            i += 2
        elif n == b"r":
            out.append(b"\r")
            i += 2
        elif n == b"t":
            out.append(b"\t")
            i += 2
        elif n.isdigit():
            j = i + 1
            while j < len(s) and j < i + 4 and s[j:j + 1].isdigit():
                j += 1
            out.append(bytes([int(s[i + 1:j], 8) & 0xFF]))
            i = j
        else:
            i += 1  # line continuation / unknown escape
    return b"".join(out).decode("latin-1")


def _strings_in_content(content: bytes) -> list[str]:
    """PDF string literals shown by Tj / ' / TJ, in stream order,
    honoring nested parens and escapes."""
    out = []
    i = 0
    n = len(content)
    while i < n:
        if content[i:i + 1] != b"(":
            i += 1
            continue
        depth = 1
        j = i + 1
        while j < n and depth:
            c = content[j:j + 1]
            if c == b"\\":
                j += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
            j += 1
        lit = content[i + 1:j - 1]
        # keep only literals consumed by a text-showing operator
        tail = content[j:j + 24].lstrip()
        if (
            tail[:2] == b"Tj"
            or tail[:1] == b"'"
            or b"TJ" in tail[:16]
            or tail[:1] == b"]"
        ):
            out.append(_unescape(lit))
        i = j
    return out


def decode_pdf_text(payload: bytes) -> list[str]:
    """Extract per-page text from a simple (unencrypted, non-scanned)
    PDF: walk the object table, resolve the page tree's /Contents,
    inflate FlateDecode streams, and collect the text-showing
    operators. Lines shown with ``'`` (move-and-show) join with
    newlines."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in payload:
        raise NotImplementedError("encrypted PDF (crypto seam)")
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    if not objs:
        raise ValueError("PDF has no objects")

    def content_of(oid: int) -> bytes:
        body = objs.get(oid, b"")
        sm = re.search(rb"stream\r?\n", body)
        if not sm:
            return b""
        # honor /Length when the dict declares it INLINE: the
        # delimiter-regex fallback's optional \r would eat a compressed
        # stream's last byte whenever that byte is 0x0D (~1/256 of
        # documents -- the sf1 sweep caught exactly this as a
        # truncated-zlib error). An INDIRECT length (`/Length 5 0 R`)
        # must NOT match -- the digits there are an object number, not
        # a byte count -- so it falls through to the delimiter scan.
        # \b blocks backtracking into a shorter digit run that would
        # sidestep the indirect-reference lookahead
        lm = re.search(
            rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)", body[: sm.start()]
        )
        if lm:
            data = body[sm.end() : sm.end() + int(lm.group(1))]
        else:
            m = _STREAM_RE.search(body)
            if not m:
                return b""
            data = m.group(1)
        if b"/FlateDecode" in body:
            data = zlib.decompress(data)
        return data

    # page order from the /Kids array when present; else object order
    page_ids = []
    for oid, body in objs.items():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            km = _KIDS_RE.search(body)
            if km:
                page_ids = [
                    int(r.group(1)) for r in _REF_RE.finditer(km.group(1))
                ]
            break
    if not page_ids:
        page_ids = sorted(
            oid
            for oid, body in objs.items()
            if b"/Type /Page" in body or b"/Type/Page" in body
        )
    pages = []
    found_text = False
    for pid in page_ids:
        cm = _CONTENTS_RE.search(objs.get(pid, b""))
        if not cm:
            pages.append("")
            continue
        strings = _strings_in_content(content_of(int(cm.group(1))))
        if strings:
            found_text = True
        pages.append("\n".join(strings))
    if page_ids and not found_text:
        raise NotImplementedError(
            "PDF pages carry no text operators (scanned/image PDF "
            "needs OCR; deployment seam)"
        )
    return pages
