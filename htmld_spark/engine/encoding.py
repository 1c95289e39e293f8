"""Byte-stream charset sniffing + UTF-8 normalization (X11).

Real crawl corpora are far from all-UTF-8: a large slice of Common-Crawl
pages is windows-1252, shift_jis (windows-31j), gbk, euc-kr, … Feeding
those bytes to a tokenizer and then ``.decode("utf-8", "replace")`` at
the end yields U+FFFD mojibake — wrong extracted text on real input
while UTF-8 fixtures stay green. This module closes that gap the way
browsers do, following the PUBLIC WHATWG Encoding Standard
(https://encoding.spec.whatwg.org/) and the html5 ``<meta>`` prescan
(HTML Standard §13.2.3.2 "determining the character encoding"):

1. **BOM sniff** — a UTF-8 / UTF-16LE / UTF-16BE byte-order mark wins
   over everything (Encoding Standard §6 "BOM sniff");
1b. **transport charset** — a recognized ``charset=`` parameter from
   the HTTP ``Content-Type`` header (callers that still have it — WARC
   ingest — pass it as ``transport_label``) outranks the in-page
   declaration, per the html5 "encoding sniffing algorithm" ordering;
   unrecognized labels fall through;
2. **meta prescan** — the first ``charset=`` inside a ``<meta`` tag
   within the first :data:`PRESCAN_BYTES` bytes, its label resolved
   through the WHATWG label registry (``latin1``/``ascii`` →
   windows-1252, ``shift_jis`` → windows-31j, …). Per the prescan's
   own post-processing rules a declared ``utf-16*`` label means the
   document actually serialized as ASCII-compatible bytes → read it as
   UTF-8, and ``x-user-defined`` → windows-1252;
2b. **BOM-less UTF-16 detection** — a dense one-sided NUL pattern in
   the window (ASCII-heavy markup in UTF-16 puts a NUL at every other
   byte) reads as UTF-16BE/LE; real servers strip BOMs and WHATWG
   punts this case to transport metadata a batch pipeline may lack;
3. **UTF-8 validation fallback** — undeclared documents that validate
   as strict UTF-8 are UTF-8 (a UTF-8 misread is astronomically
   unlikely: any non-ASCII windows-1252 text almost surely fails UTF-8
   validation);
4. **windows-1252 default** — the pragmatic crawl default (and the
   WHATWG default for the ``en`` locale). Every byte decodes, so this
   path never loses input.

``to_utf8`` applies the sniff and re-encodes to UTF-8 with U+FFFD
replacement for unmappable bytes. Valid-UTF-8 input (with or without a
recognized utf-8 declaration) returns the ORIGINAL bytes object — a
zero-copy identity fast path, so the all-UTF-8 case (most of a modern
crawl, and every page fixture) costs one C-speed validation scan and
extracted text stays byte-identical to the pre-X11 engine.

Labels not in the registry (and the WHATWG "replacement" family —
hz-gb-2312, iso-2022-kr, … whose sole spec output is U+FFFD) fall
through to steps 3/4; UTF-16 without a BOM is undetectable without
transport metadata (browsers share this blindness) and lands in step 4.

Engine contract: pure Python, no Spark imports, never raises on any
byte input.
"""

from __future__ import annotations

import re

# The html5 prescan window is 1024 bytes — but a browser that misses a
# LATE <meta charset> re-decodes when the real parser reaches it, and a
# one-shot batch pipeline cannot. Real pages routinely push the meta
# past 1 KiB with script/style-filled heads, so we scan 4× further;
# still fixed-cost and deterministic.
PRESCAN_BYTES = 4096
ENCODING_RULES_VERSION = "x11-2"

# WHATWG label registry → Python codec names (the subset with stdlib
# codecs; every value is validated by codecs.lookup in the unit tests).
# Single-byte families keep the spec's full label lists; labels whose
# spec encoding has no stdlib codec are simply absent (→ fallback).
_LABELS: dict[str, str] = {}


def _reg(codec: str, *labels: str) -> None:
    for lab in labels:
        _LABELS[lab] = codec


_reg(
    "utf-8",
    "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8",
    "utf8", "x-unicode20utf8",
)
_reg("cp866", "866", "cp866", "csibm866", "ibm866")
_reg(
    "iso8859-2",
    "csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2", "iso88592",
    "iso_8859-2", "iso_8859-2:1987", "l2", "latin2",
)
_reg(
    "iso8859-3",
    "csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3", "iso88593",
    "iso_8859-3", "iso_8859-3:1988", "l3", "latin3",
)
_reg(
    "iso8859-4",
    "csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4", "iso88594",
    "iso_8859-4", "iso_8859-4:1988", "l4", "latin4",
)
_reg(
    "iso8859-5",
    "csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144",
    "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988",
)
_reg(
    "iso8859-6",
    "arabic", "asmo-708", "csiso88596e", "csiso88596i",
    "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e",
    "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596",
    "iso_8859-6", "iso_8859-6:1987",
)
_reg(
    "iso8859-7",
    "csisolatingreek", "ecma-118", "elot_928", "greek", "greek8",
    "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597",
    "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek",
)
_reg(
    "iso8859-8",
    "csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8",
    "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598",
    "iso_8859-8", "iso_8859-8:1988", "visual",
    # iso-8859-8-i (logical order) shares the byte mapping
    "csiso88598i", "iso-8859-8-i", "logical",
)
_reg("iso8859-10", "csisolatin6", "iso-8859-10", "iso-ir-157",
     "iso8859-10", "iso885910", "l6", "latin6")
_reg("iso8859-13", "iso-8859-13", "iso8859-13", "iso885913")
_reg("iso8859-14", "iso-8859-14", "iso8859-14", "iso885914")
_reg("iso8859-15", "csisolatin9", "iso-8859-15", "iso8859-15",
     "iso885915", "iso_8859-15", "l9")
_reg("iso8859-16", "iso-8859-16")
_reg("koi8-r", "cskoi8r", "koi", "koi8", "koi8-r", "koi8_r")
_reg("koi8-u", "koi8-ru", "koi8-u")
_reg("mac-roman", "csmacintosh", "mac", "macintosh", "x-mac-roman")
_reg(
    "cp874",
    "dos-874", "iso-8859-11", "iso8859-11", "iso885911", "tis-620",
    "windows-874",
)
_reg("cp1250", "cp1250", "windows-1250", "x-cp1250")
_reg("cp1251", "cp1251", "windows-1251", "x-cp1251")
_reg(
    "cp1252",
    "ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1",
    "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591",
    "iso_8859-1", "iso_8859-1:1987", "l1", "latin1", "us-ascii",
    "windows-1252", "x-cp1252",
    # prescan rule: a declared x-user-defined means windows-1252
    "x-user-defined",
)
_reg("cp1253", "cp1253", "windows-1253", "x-cp1253")
_reg(
    "cp1254",
    "cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148", "iso8859-9",
    "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5", "latin5",
    "windows-1254", "x-cp1254",
)
_reg("cp1255", "cp1255", "windows-1255", "x-cp1255")
_reg("cp1256", "cp1256", "windows-1256", "x-cp1256")
_reg("cp1257", "cp1257", "windows-1257", "x-cp1257")
_reg("cp1258", "cp1258", "windows-1258", "x-cp1258")
_reg(
    "gbk",
    "chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312",
    "gb_2312-80", "gbk", "iso-ir-58", "x-gbk",
)
_reg("gb18030", "gb18030")
_reg("big5hkscs", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
_reg("euc-jp", "cseucpkdfmtjapanese", "euc-jp", "x-euc-jp")
_reg("iso2022-jp", "csiso2022jp", "iso-2022-jp")
_reg(
    "cp932",  # WHATWG shift_jis IS windows-31j (the superset servers mean)
    "csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis", "sjis",
    "windows-31j", "x-sjis",
)
_reg(
    "cp949",  # WHATWG euc-kr is the windows-949 superset
    "cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean",
    "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
    "windows-949",
)
_reg("utf-16-be", "unicodefffe", "utf-16be")
_reg("utf-16-le", "csunicode", "iso-10646-ucs-2", "ucs-2", "unicode",
     "unicodefeff", "utf-16", "utf-16le")

# UTF-16 labels resolved by the META PRESCAN are overridden to UTF-8
# (html5 §13.2.3.2 post-processing: the prescan just read these bytes as
# ASCII-compatible, so the label is self-refuting) — a TRANSPORT-level
# utf-16 label (HTTP Content-Type) is authoritative and kept.
_UTF16_CODECS = frozenset(("utf-16-le", "utf-16-be"))

_META_OPEN_RE = re.compile(rb"<meta[\s/]", re.IGNORECASE)
_CHARSET_RE = re.compile(
    rb"charset\s*=\s*[\"']?\s*([^\s;\"'/>]+)", re.IGNORECASE
)


def _prescan(data: bytes) -> str | None:
    """First recognized charset label inside a ``<meta`` tag starting
    within the prescan window → Python codec name, else None. A tag
    that STARTS inside the window may close shortly past it (bounded
    slack), matching the spec's attribute walk."""
    window = data[: PRESCAN_BYTES + 512]
    for m in _META_OPEN_RE.finditer(window, 0, min(len(window), PRESCAN_BYTES)):
        end = window.find(b">", m.end())
        tag = window[m.start() : end if end != -1 else m.start() + 512]
        cm = _CHARSET_RE.search(tag)
        if not cm:
            continue
        try:
            label = cm.group(1).decode("ascii").strip().lower()
        except UnicodeDecodeError:
            continue
        codec = _LABELS.get(label)
        if codec is not None:
            # first RECOGNIZED label wins; junk is skipped
            return "utf-8" if codec in _UTF16_CODECS else codec
    return None


def content_type_charset(value) -> str | None:
    """``charset=`` parameter of an HTTP Content-Type header value
    (RFC 9110 §8.3), lowercased, quotes stripped; None when absent or
    unparseable. Never raises."""
    try:
        if not value:
            return None
        if isinstance(value, (bytes, bytearray, memoryview)):
            value = bytes(value).decode("latin-1", "replace")
        for part in str(value).split(";")[1:]:
            k, _, v = part.partition("=")
            if k.strip().lower() == "charset":
                label = v.strip().strip("\"'").strip().lower()
                return label or None
        return None
    except Exception:  # absolute backstop: never raise
        return None


def sniff_encoding(data, transport_label: str | None = None) -> tuple[str, str]:
    """(python_codec, source) for an html byte stream; source is one of
    ``bom`` / ``transport`` (a recognized HTTP Content-Type charset
    label — pass it via ``transport_label``) / ``meta`` /
    ``nul-pattern`` (BOM-less UTF-16 by NUL layout) / ``utf-8``
    (validated undeclared) / ``fallback`` (windows-1252 default).
    Precedence per the WHATWG ladder: BOM > transport > meta prescan >
    content sniff. Never raises."""
    try:
        if not isinstance(data, bytes):
            data = bytes(data or b"")
        if data[:3] == b"\xef\xbb\xbf":
            return "utf-8", "bom"
        if data[:2] == b"\xff\xfe":
            return "utf-16-le", "bom"
        if data[:2] == b"\xfe\xff":
            return "utf-16-be", "bom"
        if transport_label:
            codec = _LABELS.get(str(transport_label).strip().lower())
            if codec is not None:
                return codec, "transport"
            # unrecognized transport label: fall through to the prescan
        codec = _prescan(data)
        if codec is not None:
            return codec, "meta"
        # BOM-less UTF-16 (servers strip BOMs; WHATWG leaves this to
        # transport metadata a batch pipeline may not have): markup is
        # ASCII-heavy, so UTF-16 text shows a NUL at every other byte —
        # at the HIGH (even) offset for BE, the LOW (odd) one for LE.
        # Only a dense, one-sided NUL pattern triggers (no sane
        # single-byte page is ≥35% NUL); anything weaker falls through.
        if len(data) >= 8:
            window = data[: PRESCAN_BYTES & ~1]
            even = window[::2].count(0)
            odd = window[1::2].count(0)
            half = len(window) // 2
            if even + odd >= int(0.35 * len(window)):
                if even >= 4 * max(odd, 1) and even >= half // 2:
                    return "utf-16-be", "nul-pattern"
                if odd >= 4 * max(even, 1) and odd >= half // 2:
                    return "utf-16-le", "nul-pattern"
        try:
            data.decode("utf-8")
            return "utf-8", "utf-8"
        except UnicodeDecodeError:
            return "cp1252", "fallback"
    except Exception:  # absolute backstop: never raise
        return "utf-8", "utf-8"


def to_utf8(data, transport_label: str | None = None) -> tuple[bytes, str, str]:
    """Normalize an html byte stream to UTF-8: ``(utf8_bytes,
    python_codec, source)``. ``transport_label`` is the HTTP
    Content-Type charset when the caller has one (WARC ingest keeps
    it) — it outranks the meta prescan per the WHATWG ladder.
    Valid-UTF-8 input comes back as the SAME object (zero-copy
    identity — the hot path of a modern crawl); everything else
    decodes with U+FFFD replacement and re-encodes. Never raises."""
    try:
        if not isinstance(data, bytes):
            data = bytes(data or b"")
        codec, source = sniff_encoding(data, transport_label)
        if codec == "utf-8":
            body = data[3:] if source == "bom" else data
            try:
                body.decode("utf-8")
                return body, codec, source  # identity fast path
            except UnicodeDecodeError:
                return body.decode("utf-8", "replace").encode(), codec, source
        txt = data.decode(codec, "replace")
        if source == "bom" and txt[:1] == "﻿":
            txt = txt[1:]  # the BOM is framing, not content
        return txt.encode("utf-8"), codec, source
    except Exception:  # unknown codec / backstop: pass bytes through
        try:
            return bytes(data or b""), "utf-8", "utf-8"
        except Exception:
            return b"", "utf-8", "utf-8"
