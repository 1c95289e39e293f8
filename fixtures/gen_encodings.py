"""Deterministic multi-charset page fixture with independently composed
expected text (the gen_pages.py philosophy applied to the X11 encoding
leg: html bytes and expected mcx-1 output are composed SEPARATELY — the
html through each target codec's own encoder, the expectation straight
from the logical lines).

Each row draws 2–5 paragraph lines from a per-script word pool mixed
with ASCII filler, wraps them in a boilerplate frame (head + nav +
footer the mcx-1 extractor must ignore) with ``<main><p>…`` as the
core, and serializes the WHOLE page through one of ~30 encoding modes:

- declared single-byte pages (windows-125x, iso-8859-x via their WHATWG
  alias labels — ``latin1``/``latin2``/``greek``/``tis-620``/…,
  ``macintosh``, ``ibm866``, koi8-r/u);
- declared CJK pages (``shift_jis`` → windows-31j bytes, euc-jp,
  iso-2022-jp, ``gb2312`` → gbk bytes, gb18030, big5, euc-kr);
- declaration carried by either form — ``<meta charset=X>`` or
  ``<meta http-equiv=content-type content="text/html; charset=X">``;
- BOM rows: UTF-8-with-BOM, UTF-16LE, UTF-16BE (no usable meta — the
  BOM is the signal);
- the prescan's own edge rules: a declared ``utf-16`` label over
  ASCII-compatible bytes (→ read as UTF-8), ``x-user-defined``
  (→ windows-1252), an unrecognized label (``charset=banana``) that
  falls through to UTF-8 validation;
- fallback rows: undeclared windows-1252 bytes (invalid as UTF-8 →
  the windows-1252 default), undeclared pure-ASCII and undeclared
  valid UTF-8 (the identity path);
- v2: a LATE ``<meta charset>`` pushed ~3 KB into the head (past the
  spec's 1024-byte prescan, inside the engine's widened 4096 window)
  and BOM-less UTF-16LE/BE rows (the NUL-pattern detection rung —
  real servers strip BOMs).

Columns: url, html (binary), text (expected mcx-1 output), encoding +
source (the expected sniff verdict — the census golden), declared_label.

Corrupt/hostile byte streams are exercised by the never-raise unit
battery (tests/test_encoding.py), not here — they have no composable
expectation.

Imports no engine code (golden-oracle independence, VERDICT r04).
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

DATA_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "encodings"
)
ENC_FIXTURE_VERSION = "2"

_ASCII = (
    "crawl corpus extract parse token batch shard worker lineage "
    "resume spark arrow codec stream page"
).split()

_POOLS = {
    "west": "café résumé naïve façade Zürich déjà señor".split(),
    "west15": "café façade œuvre €uro ligature".split(),  # 8859-15/cp1252 extras
    "mac": "café naïve déjà résumé".split(),
    "cyr": "данные корпус текст поиск коллекция язык".split(),
    "greek": "κείμενο γλώσσα δεδομένα σελίδα".split(),
    "latin2": "žluťoučký kůň příliš ďábelské ódy".split(),
    "baltic": "žodis tekstas kalba duomenų".split(),
    "turk": "türkçe metin dağıtık çözümleme".split(),
    "thai": "ทดสอบ ขอความ ภาษา".split(),
    "arab": "نص بيانات لغة صفحة".split(),
    "heb": "טקסט נתונים שפה עמוד".split(),
    "jp": "日本語 テスト 文字列 抽出 解析".split(),
    "zh_s": "中文 数据 文本 解析 页面".split(),
    "zh_t": "中文 資料 文字 解析 頁面".split(),
    "kr": "한국어 텍스트 데이터 분석".split(),
    "uni": "mixed Ωmega 中文 café данные".split(),
    "ascii": [],
}

# (declared_label | None, python_codec_to_encode, pool, expected_codec,
#  expected_source, bom | None)
_BOM_LE, _BOM_BE, _BOM8 = b"\xff\xfe", b"\xfe\xff", b"\xef\xbb\xbf"
MODES = [
    ("utf-8", "utf-8", "uni", "utf-8", "meta", None),
    (None, "utf-8", "ascii", "utf-8", "utf-8", None),
    (None, "utf-8", "uni", "utf-8", "utf-8", None),
    (None, "utf-8", "west", "utf-8", "utf-8", None),
    (None, "utf-8", "uni", "utf-8", "bom", _BOM8),
    (None, "utf-16-le", "uni", "utf-16-le", "bom", _BOM_LE),
    (None, "utf-16-be", "uni", "utf-16-be", "bom", _BOM_BE),
    ("latin1", "cp1252", "west", "cp1252", "meta", None),
    ("iso-8859-1", "cp1252", "west", "cp1252", "meta", None),
    ("windows-1252", "cp1252", "west15", "cp1252", "meta", None),
    (None, "cp1252", "west", "cp1252", "fallback", None),
    ("shift_jis", "cp932", "jp", "cp932", "meta", None),
    ("sjis", "cp932", "jp", "cp932", "meta", None),
    ("euc-jp", "euc-jp", "jp", "euc-jp", "meta", None),
    ("iso-2022-jp", "iso2022-jp", "jp", "iso2022-jp", "meta", None),
    ("gb2312", "gbk", "zh_s", "gbk", "meta", None),
    ("gbk", "gbk", "zh_s", "gbk", "meta", None),
    ("gb18030", "gb18030", "zh_s", "gb18030", "meta", None),
    ("big5", "big5hkscs", "zh_t", "big5hkscs", "meta", None),
    ("euc-kr", "cp949", "kr", "cp949", "meta", None),
    ("windows-1251", "cp1251", "cyr", "cp1251", "meta", None),
    ("koi8-r", "koi8-r", "cyr", "koi8-r", "meta", None),
    ("cyrillic", "iso8859-5", "cyr", "iso8859-5", "meta", None),
    ("ibm866", "cp866", "cyr", "cp866", "meta", None),
    ("latin2", "iso8859-2", "latin2", "iso8859-2", "meta", None),
    ("windows-1250", "cp1250", "latin2", "cp1250", "meta", None),
    ("greek", "iso8859-7", "greek", "iso8859-7", "meta", None),
    ("windows-1253", "cp1253", "greek", "cp1253", "meta", None),
    ("tis-620", "cp874", "thai", "cp874", "meta", None),
    ("windows-1256", "cp1256", "arab", "cp1256", "meta", None),
    ("windows-1255", "cp1255", "heb", "cp1255", "meta", None),
    ("macintosh", "mac-roman", "mac", "mac-roman", "meta", None),
    ("iso-8859-15", "iso8859-15", "west15", "iso8859-15", "meta", None),
    ("latin5", "cp1254", "turk", "cp1254", "meta", None),
    ("windows-1257", "cp1257", "baltic", "cp1257", "meta", None),
    # prescan edge rules
    ("utf-16", "utf-8", "uni", "utf-8", "meta", None),
    ("x-user-defined", "cp1252", "west", "cp1252", "meta", None),
    ("banana", "utf-8", "uni", "utf-8", "utf-8", None),
    # v2: a LATE meta (~3 KB of head script before it — past the spec's
    # 1024-byte prescan, inside this engine's 4096 batch window)
    ("koi8-r", "koi8-r", "cyr", "koi8-r", "meta", None, True),
    # v2: BOM-less UTF-16 (servers strip BOMs) — the NUL-pattern rung
    (None, "utf-16-le", "uni", "utf-16-le", "nul-pattern", None),
    (None, "utf-16-be", "uni", "utf-16-be", "nul-pattern", None),
]

ROWS_PER_MODE = 4


def _lines(rng: random.Random, pool_key: str) -> list[str]:
    pool = _POOLS[pool_key]
    lines = []
    for _ in range(rng.randint(2, 5)):
        words = []
        for _ in range(rng.randint(3, 8)):
            src = pool if pool and rng.random() < 0.55 else _ASCII
            words.append(rng.choice(src))
        lines.append(" ".join(words))
    return lines


def _page(declared: str | None, lines: list[str], rng: random.Random,
          late: bool = False) -> str:
    if declared is None:
        meta = ""
    elif rng.random() < 0.5:
        meta = f'<meta charset="{declared}">'
    else:
        meta = (
            '<meta http-equiv="Content-Type" '
            f'content="text/html; charset={declared}">'
        )
    if late:  # push the declaration past the 1024-byte spec prescan
        meta = '<script>var pad="' + "x" * 3000 + '";</script>' + meta
    return (
        "<!DOCTYPE html><html><head><title>enc fixture</title>"
        f"{meta}</head><body>"
        '<nav><a href="/">Home</a> <a href="/x">X</a></nav>'
        "<main>"
        + "".join(f"<p>{ln}</p>" for ln in lines)
        + "</main><footer>footer boilerplate</footer></body></html>"
    )


def draw_row(i: int):
    declared, codec, pool, exp_codec, exp_source, bom, *rest = (
        MODES[i % len(MODES)]
    )
    rng = random.Random(0xE11C + i)
    lines = _lines(rng, pool)
    late = bool(rest and rest[0])
    html = _page(declared, lines, rng, late).encode(codec)  # strict: a pool word
    # outside its codec is a GENERATOR bug and must fail loudly here
    if bom is not None:
        html = bom + html
    url = f"https://enc.example/{exp_codec}/{i}"
    return (
        url, html, "\n".join(lines), exp_codec, exp_source, declared,
    )


def ensure_encodings() -> str:
    """Generate + cache the fixture parquet. Returns its path."""
    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, "encoded_pages.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker) and os.path.exists(path):
        with open(marker) as f:
            if f.read().strip() == ENC_FIXTURE_VERSION:
                return path
    rows = [draw_row(i) for i in range(len(MODES) * ROWS_PER_MODE)]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "html": pa.array([r[1] for r in rows], pa.binary()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "encoding": pa.array([r[3] for r in rows], pa.string()),
                "source": pa.array([r[4] for r in rows], pa.string()),
                "declared_label": pa.array(
                    [r[5] for r in rows], pa.string()
                ),
            }
        ),
        path,
    )
    with open(marker, "w") as f:
        f.write(ENC_FIXTURE_VERSION)
    return path


if __name__ == "__main__":
    p = ensure_encodings()
    t = pq.read_table(p)
    print(p, t.num_rows, "rows,", len(MODES), "modes")
