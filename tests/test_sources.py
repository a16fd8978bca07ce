"""S1 binaryFile scan + the import gates on external-model seams."""

from __future__ import annotations

import pytest

from koby_s_ai_vector_db_spark.sources.multimodal import scan_binary_dir
from koby_s_ai_vector_db_spark.sources.pdf import extract_pdf_pages


def test_binary_dir_scan(spark, tmp_path):
    """S1 (embed_pdfs.py:67): glob-filtered directory scan yields
    (path, modificationTime, length, content binary)."""
    (tmp_path / "a.pdf").write_bytes(b"%PDF-1.4 fake")
    (tmp_path / "b.PDF").write_bytes(b"%PDF-1.4 fake2")
    (tmp_path / "c.txt").write_bytes(b"not a pdf")
    df = scan_binary_dir(spark, str(tmp_path), glob="*.[pP][dD][fF]")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 2  # case-insensitive match, txt excluded
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert bytes(by_name["a.pdf"].content) == b"%PDF-1.4 fake"
    assert by_name["b.PDF"].length == len(b"%PDF-1.4 fake2")


def test_pdf_extract_is_gated(spark, tmp_path):
    """Without pypdf the real extractor must fail loudly — now at plan
    build time (driver-side gate, clearer than a worker task failure) —
    not silently fake results."""
    (tmp_path / "a.pdf").write_bytes(b"%PDF-1.4 fake")
    with pytest.raises(NotImplementedError, match="pypdf"):
        extract_pdf_pages(scan_binary_dir(spark, str(tmp_path)))
