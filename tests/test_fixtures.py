"""The byte-identity gate: engine main_text vs the independently-composed
golden ``text`` column of the pages fixture (BASELINE.json: "byte-identical
extracted text per url"). Runs the FULL sf0.001 corpus (1k+ docs, every
template family)."""

import pyarrow.parquet as pq
import pytest

from fixtures.gen_pages import ensure_pages, gen_rows
from htmld_spark.engine import main_text, parse_document


@pytest.fixture(scope="module")
def pages():
    return pq.read_table(ensure_pages("0.001"))


def test_fixture_is_deterministic():
    a = gen_rows(50)
    b = gen_rows(50)
    assert a == b


def test_fixture_has_every_family(pages):
    urls = pages.column("url").to_pylist()
    fams = {u.split("/")[3] for u in urls}
    assert fams == {
        "clean",
        "entities",
        "implied",
        "misnest",
        "rawtext",
        "attrs",
        "comments",
        "selector",
        "void",
        "encoding",
    }


def test_fixture_skew_and_dups(pages):
    urls = pages.column("url").to_pylist()
    hot = sum(1 for u in urls if "hot.example.com" in u)
    assert hot >= 0.25 * len(urls)  # skewed host for R4 salting
    assert len(set(urls)) < len(urls)  # duplicated urls for R10 dedup


def test_fixture_has_oversized(pages):
    sizes = [len(h) for h in pages.column("html").to_pylist()]
    assert max(sizes) > 1_000_000
    assert min(sizes) < 10_000


def test_byte_identical_extraction_full_corpus(pages):
    """THE gate: engine output == golden text, byte for byte, every row."""
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    urls = pages.column("url").to_pylist()
    bad = []
    for url, html, expected in zip(urls, htmls, texts):
        got = main_text(parse_document(html)).decode("utf-8")
        if got != expected:
            bad.append((url, expected, got))
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]}"
