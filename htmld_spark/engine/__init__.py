"""Pure-Python HTML engine (no Spark imports allowed in this subpackage).

Mirrors the capability surface of the reference htmld library
(src/html/parser.d, dom.d, entities.d, utils.d [recalled — see SURVEY.md
provenance warning]): forgiving tokenizer, arena DOM with implied-end-tag and
misnesting recovery, CSS selector engine, innerText/outerHTML traversal —
plus the span-offset and main-content extraction mandated by BASELINE.json.
"""

from htmld_spark.engine.dom import Document, parse_document  # noqa: F401
from htmld_spark.engine.selector import compile_selector  # noqa: F401
from htmld_spark.engine.extract import (  # noqa: F401
    inner_text,
    outer_html,
    main_text,
    element_spans,
)
