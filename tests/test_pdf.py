"""Minimal PDF writer + text extractor (sources/pdf.py)."""

from __future__ import annotations

import pytest

from sample_for_transactional_datalake_using_s3tables_spark.sources.pdf import (
    decode_pdf_text,
    encode_pdf,
)

# Long-tail battery: excluded from the default gate (VERDICT r13 #4
# -- the full suite outgrew the driver's verification budget). Run
# everything with:  python -m pytest tests/ -q -m "slow or not slow"
pytestmark = pytest.mark.slow



def test_roundtrip_multipage_escapes_compression():
    pages = [
        "hello world\nsecond line",
        "parens (nested (deep)) and \\ backslash",
        "tabs\tand\rreturns",
    ]
    for compress in (True, False):
        got = decode_pdf_text(encode_pdf(pages, compress=compress))
        assert got == pages, compress


def test_page_order_follows_kids_array():
    pdf = encode_pdf(["first", "second", "third"])
    assert decode_pdf_text(pdf) == ["first", "second", "third"]


def test_octal_escape_and_empty_page():
    # hand-check the escape decoder through a generated doc with a
    # character that must survive latin-1 octal round-tripping
    pages = ["caf\xe9 costs 3 \xa3", ""]
    got = decode_pdf_text(encode_pdf(pages))
    assert got[0] == pages[0]


def test_seams_raise_clearly():
    with pytest.raises(ValueError, match="PDF"):
        decode_pdf_text(b"not a pdf")
    with pytest.raises(NotImplementedError, match="crypto"):
        decode_pdf_text(b"%PDF-1.4\n1 0 obj\n<< /Encrypt 5 0 R >>\nendobj")
    # image-only page: content stream with no text operators
    import zlib

    body = zlib.compress(b"q 100 0 0 100 0 0 cm /Im1 Do Q")
    head = b"1 0 obj\n<< /Filter /FlateDecode /Length "
    head += str(len(body)).encode() + b" >>\nstream\n"
    scanned = (
        b"%PDF-1.4\n" + head + body + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page /Contents 1 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n"
    )
    with pytest.raises(NotImplementedError, match="OCR"):
        decode_pdf_text(scanned)


def test_indirect_length_reference_falls_back_to_delimiter():
    """`/Length 5 0 R` (indirect reference) must NOT be read as a byte
    count -- the digits are an object number; extraction falls back to
    the delimiter scan (code-review r8 finding)."""
    import re
    import zlib

    from sample_for_transactional_datalake_using_s3tables_spark.sources.pdf import (
        decode_pdf_text,
        encode_pdf,
    )

    pdf = encode_pdf(["hello indirect world"])
    # rewrite the inline /Length N into an indirect /Length N 0 R form
    # (padding keeps offsets harmless: the xref is tolerated loosely)
    out = re.sub(
        rb"/Length (\d+) >>", rb"/Length \1 0 R>>", pdf, count=1
    )
    assert out != pdf
    pages = decode_pdf_text(out)
    assert pages == ["hello indirect world"]
