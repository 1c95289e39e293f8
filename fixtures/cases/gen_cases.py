"""Operator-level golden case tables (FIXTURES.md §2) — the formalized
analog of the reference's inline unittest blocks (src/html/dom.d bottom
[recalled], SURVEY.md §5.1).

Each JSON file is a list of case rows; expectations are HAND-WRITTEN here
(never produced by the engine under test). tests/test_cases.py replays them
through the engine byte-exactly. html/expected bytes are stored as UTF-8
strings (cases avoid non-UTF-8 bytes; raw-bytes recovery is covered by the
hypothesis suites instead).

Regenerate with:  python fixtures/cases/gen_cases.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

CASES_ENTITIES = [
    {"case_id": "named_basic", "input": "a &amp; b", "expected": "a & b"},
    {"case_id": "named_no_semi", "input": "a &amp b", "expected": "a &amp b"},
    {"case_id": "named_unknown", "input": "&notareal;", "expected": "&notareal;"},
    {"case_id": "dec", "input": "&#65;&#228;", "expected": "Aä"},
    {"case_id": "hex_mixed_case", "input": "&#x41;&#X42;", "expected": "AB"},
    {"case_id": "astral", "input": "&#x1F4A9;", "expected": "\U0001f4a9"},
    {"case_id": "zero_invalid", "input": "&#0;", "expected": "&#0;"},
    {"case_id": "range_invalid", "input": "&#1114112;", "expected": "&#1114112;"},
    {"case_id": "surrogate_invalid", "input": "&#xD800;", "expected": "&#xD800;"},
    {"case_id": "adjacent", "input": "&lt;&gt;&quot;", "expected": "<>\""},
    {"case_id": "bare_amp", "input": "fish & chips", "expected": "fish & chips"},
]

# tokens_json: [kind, payload] event stream; payload = text for text/entity
# (decoded), tag name for open/close, content for comment/cdata/doctype/pi.
CASES_TOKENIZE = [
    {"case_id": "simple", "html": "a<b>c</b>",
     "tokens": [["text", "a"], ["open", "b"], ["text", "c"], ["close", "b"]]},
    {"case_id": "attrs_mixed", "html": "<a href=\"x\" id='y' bare>",
     "tokens": [["open", "a"]]},
    {"case_id": "self_closing", "html": "<br/>",
     "tokens": [["open", "br"]]},
    {"case_id": "comment_tolerant", "html": "<!-- a -- b -->",
     "tokens": [["comment", " a -- b "]]},
    {"case_id": "cdata", "html": "<![CDATA[x<y]]>",
     "tokens": [["cdata", "x<y"]]},
    {"case_id": "doctype", "html": "<!DOCTYPE html>",
     "tokens": [["doctype", "DOCTYPE html"]]},
    {"case_id": "pi", "html": "<?pi data?>",
     "tokens": [["pi", "pi data"]]},
    {"case_id": "stray_lt", "html": "a < b",
     "tokens": [["text", "a "], ["text", "<"], ["text", " b"]]},
    {"case_id": "eof_in_tag", "html": "ok<div foo",
     "tokens": [["text", "ok"]]},
    {"case_id": "bogus_close", "html": "a</ x>b",
     "tokens": [["text", "a"], ["text", "b"]]},
    {"case_id": "script_raw", "html": "<script>a<b&amp;</script>",
     "tokens": [["open", "script"], ["text", "a<b&amp;"], ["close", "script"]]},
    {"case_id": "title_rcdata", "html": "<title>a&amp;<b></title>",
     "tokens": [["open", "title"], ["text", "a"], ["entity", "&"],
                ["text", "<b>"], ["close", "title"]]},
    {"case_id": "entity_in_text", "html": "x&#65;y",
     "tokens": [["text", "x"], ["entity", "A"], ["text", "y"]]},
]

# expected_texts: inner_text of each match, in document order
CASES_SELECT = [
    {"case_id": "tag", "html": "<div><p>a</p><p>b</p></div>",
     "selector": "p", "expected_texts": ["a", "b"]},
    {"case_id": "id", "html": "<p id=x>a</p><p>b</p>",
     "selector": "#x", "expected_texts": ["a"]},
    {"case_id": "class_word", "html": "<p class='m n'>a</p><p class='mn'>b</p>",
     "selector": ".n", "expected_texts": ["a"]},
    {"case_id": "attr_ops", "html": "<a href='https://x/y'>a</a><a href='http://z'>b</a>",
     "selector": "a[href^='https://']", "expected_texts": ["a"]},
    {"case_id": "child", "html": "<div><p>a</p><section><p>b</p></section></div>",
     "selector": "div > p", "expected_texts": ["a"]},
    {"case_id": "descendant", "html": "<div><section><p>b</p></section></div>",
     "selector": "div p", "expected_texts": ["b"]},
    {"case_id": "adjacent", "html": "<p>a</p><p>b</p><span>c</span>",
     "selector": "p + p", "expected_texts": ["b"]},
    {"case_id": "sibling_general", "html": "<p>a</p><i>x</i><span>c</span>",
     "selector": "p ~ span", "expected_texts": ["c"]},
    {"case_id": "nth", "html": "<ul><li>1</li><li>2</li><li>3</li><li>4</li></ul>",
     "selector": "li:nth-child(even)", "expected_texts": ["2", "4"]},
    {"case_id": "not", "html": "<p class=x>a</p><p>b</p>",
     "selector": "p:not(.x)", "expected_texts": ["b"]},
    {"case_id": "group", "html": "<p>a</p><i>b</i><b>c</b>",
     "selector": "i, b", "expected_texts": ["b", "c"]},
    {"case_id": "implied_end_tree", "html": "<ul><li>a<li>b</ul>",
     "selector": "ul > li", "expected_texts": ["a", "b"]},
]

CASES_EXTRACT = [
    {"case_id": "inner_raw", "html": "<div> a <b>c</b>\nd</div>",
     "inner_text": " a c\nd",
     "outer_html": "<div> a <b>c</b>\nd</div>"},
    {"case_id": "escape_roundtrip", "html": "<p>a &amp; b</p>",
     "inner_text": "a & b", "outer_html": "<p>a &amp; b</p>"},
    {"case_id": "void", "html": "<p>x<br>y</p>",
     "inner_text": "xy", "outer_html": "<p>x<br/>y</p>"},
    {"case_id": "misnest_recover", "html": "<div><span>x</div>y",
     "inner_text": "xy", "outer_html": "<div><span>x</span></div>y"},
    {"case_id": "main_text_blocks", "html": "<main><p> a  b </p><p>c</p></main>",
     "main_text": "a b\nc"},
    {"case_id": "main_text_strip", "html":
        "<body><nav>skip</nav><main><p>keep</p></main><footer>skip</footer></body>",
     "main_text": "keep"},
]


def main() -> None:
    for name, cases in [
        ("cases_entities", CASES_ENTITIES),
        ("cases_tokenize", CASES_TOKENIZE),
        ("cases_select", CASES_SELECT),
        ("cases_extract", CASES_EXTRACT),
    ]:
        path = os.path.join(HERE, f"{name}.json")
        with open(path, "w") as f:
            json.dump(cases, f, indent=1, ensure_ascii=False)
        print(f"{path}: {len(cases)} cases")


if __name__ == "__main__":
    main()
