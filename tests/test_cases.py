"""Replay the golden case tables (fixtures/cases/*.json, FIXTURES.md §2)
through the engine byte-exactly — the formalized port of the reference's
inline-unittest style (SURVEY.md §5.1)."""

import json
import os

import pytest

from htmld_spark.engine.dom import parse_document
from htmld_spark.engine.entities import decode_entities
from htmld_spark.engine.extract import inner_text, main_text, outer_html
from htmld_spark.engine.selector import query_select_all
from htmld_spark.engine.tokenizer import tokenize

CASES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "cases"
)


def load(name):
    with open(os.path.join(CASES_DIR, f"{name}.json")) as f:
        return json.load(f)


def test_cases_files_exist():
    # regenerate with python fixtures/cases/gen_cases.py
    for n in ("cases_entities", "cases_tokenize", "cases_select", "cases_extract"):
        assert os.path.exists(os.path.join(CASES_DIR, f"{n}.json")), n


@pytest.mark.parametrize("case", load("cases_entities"), ids=lambda c: c["case_id"])
def test_entity_cases(case):
    got = decode_entities(case["input"].encode()).decode()
    assert got == case["expected"], case["case_id"]


class _Collector:
    def __init__(self, src: bytes):
        self.src = src
        self.out = []

    def on_text(self, s, e):
        self.out.append(["text", self.src[s:e].decode()])

    def on_entity(self, s, e, d):
        self.out.append(["entity", d.decode()])

    def on_open(self, name, raw, attrs, s, e, sc):
        self.out.append(["open", name.decode()])

    def on_close(self, name, s, e):
        self.out.append(["close", name.decode()])

    def on_comment(self, s, e):
        self.out.append(["comment", self.src[s:e].decode()])

    def on_cdata(self, s, e):
        self.out.append(["cdata", self.src[s:e].decode()])

    def on_doctype(self, s, e):
        self.out.append(["doctype", self.src[s:e].decode()])

    def on_decl(self, s, e):
        self.out.append(["decl", self.src[s:e].decode()])

    def on_pi(self, s, e):
        self.out.append(["pi", self.src[s:e].decode()])

    def on_done(self, e):
        pass


@pytest.mark.parametrize("case", load("cases_tokenize"), ids=lambda c: c["case_id"])
def test_tokenize_cases(case):
    src = case["html"].encode()
    col = _Collector(src)
    tokenize(src, col)
    if case["case_id"] == "attrs_mixed":  # only the open event is pinned
        col.out = [ev for ev in col.out if ev[0] == "open"]
    assert col.out == case["tokens"], case["case_id"]


@pytest.mark.parametrize("case", load("cases_select"), ids=lambda c: c["case_id"])
def test_select_cases(case):
    doc = parse_document(case["html"].encode())
    got = [
        inner_text(doc, n).decode()
        for n in query_select_all(doc, case["selector"])
    ]
    assert got == case["expected_texts"], case["case_id"]


@pytest.mark.parametrize("case", load("cases_extract"), ids=lambda c: c["case_id"])
def test_extract_cases(case):
    doc = parse_document(case["html"].encode())
    if "inner_text" in case:
        assert inner_text(doc).decode() == case["inner_text"], case["case_id"]
    if "outer_html" in case:
        assert outer_html(doc, 0).decode() == case["outer_html"], case["case_id"]
    if "main_text" in case:
        assert main_text(doc).decode() == case["main_text"], case["case_id"]
