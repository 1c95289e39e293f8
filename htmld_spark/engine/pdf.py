"""Forgiving PDF text extraction — the "PDF/layout parse" leg of the
extraction tier (BASELINE.json north_rule names "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; the HTML legs live in tokenizer.py /
dom.py / extract.py).

Built from the PUBLIC PDF 1.7 spec (ISO 32000-1): §7.3 object syntax and
string escapes, §7.4.4 FlateDecode, §7.5 file structure, §9.4 text
objects and show operators. Like the HTML engine this module imports no
Spark, is deterministic, and NEVER raises on any byte input — the same
forgiving-parser stance dom.py takes for tag soup, applied to PDF:

- xref-FREE object discovery: a sequential scan for ``N G obj …
  endobj`` finds every object body, so broken or absent xref tables,
  incremental-update files, prepended garbage and truncated tails all
  still yield whatever objects survive (real crawls are full of such
  PDFs; a spec-strict xref reader would reject them outright). When the
  same object number appears twice (incremental updates) the LAST
  occurrence wins, matching update semantics.
- page ORDER: Root → /Pages → /Kids tree walk when the trailer (or a
  /Type/Catalog scan) resolves; else /Type/Page objects in file order;
  else every decoded stream containing a ``BT`` text object, in file
  order. Each rung of the ladder degrades coverage, never correctness
  of what IS emitted.
- streams: ``/Length`` is advisory only — the stream body runs to the
  nearest ``endstream`` (bogus or indirect lengths tolerated).
  FlateDecode decompresses via zlib with a partial-output salvage path
  (``decompressobj`` keeps whatever decoded before a corrupt tail);
  LZWDecode (EarlyChange, prefix-salvaging, bomb-capped),
  RunLengthDecode, ASCIIHexDecode and ASCII85Decode (z-shorthand,
  partial-group salvage) are supported, including filter chains like
  ``[/ASCII85Decode /FlateDecode]``; unknown filters
  (DCTDecode etc. — image data) skip the stream.
- text: inside BT…ET, ``Tj``/``'``/``"`` and ``TJ`` emit; ``Td``/``TD``
  with a y-translation, ``T*`` and a ``Tm`` whose y changes start a new
  line (the layout heuristic: y-motion = line break, x-only motion =
  same line); a TJ kern ≤ −``TJ_SPACE_KERN`` thousandths em emits one
  space (the standard word-gap encoding). Literal-string escapes
  (\\n \\r \\t \\b \\f, octal, line continuations, nested parens) and
  hex strings follow §7.3.4.
- encoding: single-byte strings decode as PDFDocEncoding (Annex D.2 —
  Latin-1 plus the real 0x18–0x1F/0x80–0xA0 punctuation mappings);
  strings with a UTF-16BE BOM decode as UTF-16BE. Multi-byte Type0/CID
  fonts ARE supported via per-font /ToUnicode CMaps (§9.10.3:
  codespacerange width, bfchar, bfrange incl. incremented and
  array-destination forms): the page's /Resources /Font table is
  resolved, ``Tf`` switches the active font, and show-operator bytes
  decode as fixed-width code units through the CMap — unmapped 2-byte
  codes fall back to UTF-16BE (the Identity-H-without-CMap reality).
- FORM XObjects (§8.10): ``Do`` splices the form's text lines in place
  — headers, watermarks and sometimes whole page bodies ship as forms;
  each form decodes with its own /Resources fonts (inheriting the
  caller's when absent), depth-capped and cycle-guarded. Image
  XObjects are skipped (no text).

Pages are joined with a blank line ("\\n\\n"), lines within a page with
"\\n"; whitespace-only lines are dropped. ``extract_pdf_text`` returns
str; ``pdf_page_count`` returns the number of pages the ladder found.
"""

from __future__ import annotations

import re
import zlib

TJ_SPACE_KERN = 180.0  # |kern| (thousandths of an em) treated as a word gap

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d{1,10})[\x00\t\n\x0c\r ]+(\d{1,5})[\x00\t\n\x0c\r ]+obj\b")

_ESC = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}


# ------------------------------------------------------------------ low-level lexing


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and data[i] not in b"\r\n":
                i += 1
        else:
            break
    return i


def _parse_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """data[i] == '('. Returns (raw bytes, index past the closing ')')."""
    out = bytearray()
    n = len(data)
    depth = 1
    i += 1
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash escape
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESC:
                out.append(_ESC[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                v = 0
                k = 0
                while k < 3 and i < n and 0x30 <= data[i] <= 0x37:
                    v = v * 8 + (data[i] - 0x30)
                    i += 1
                    k += 1
                out.append(v & 0xFF)
            elif e in b"\r\n":  # line continuation: swallow EOL
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: emit the char itself (spec §7.3.4.2)
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    """data[i] == '<' (single). Returns (raw bytes, index past '>')."""
    n = len(data)
    i += 1
    digits = []
    while i < n and data[i] != 0x3E:
        c = data[i]
        if c in b"0123456789abcdefABCDEF":
            digits.append(chr(c))
        i += 1
    if i < n:
        i += 1  # '>'
    if len(digits) % 2:
        digits.append("0")  # odd count: pad (spec §7.3.4.3)
    try:
        raw = bytes.fromhex("".join(digits))
    except ValueError:  # unreachable after filtering, but never raise
        raw = b""
    return raw, i


# PDFDocEncoding (spec Annex D.2) where it DIFFERS from Latin-1: the
# 0x18–0x1F accent modifiers and the 0x80–0xA0 punctuation block (smart
# quotes, dashes, ellipsis, ligatures, €). Latin-1 maps these to C1
# control characters — never what a document meant. Applied via
# str.translate after the Latin-1 decode (identity elsewhere).
_PDFDOC_DELTA = str.maketrans({
    0x18: "˘", 0x19: "ˇ", 0x1A: "ˆ", 0x1B: "˙",
    0x1C: "˝", 0x1D: "˛", 0x1E: "˚", 0x1F: "˜",
    0x80: "•", 0x81: "†", 0x82: "‡", 0x83: "…",
    0x84: "—", 0x85: "–", 0x86: "ƒ", 0x87: "⁄",
    0x88: "‹", 0x89: "›", 0x8A: "−", 0x8B: "‰",
    0x8C: "„", 0x8D: "“", 0x8E: "”", 0x8F: "‘",
    0x90: "’", 0x91: "‚", 0x92: "™", 0x93: "ﬁ",
    0x94: "ﬂ", 0x95: "Ł", 0x96: "Œ", 0x97: "Š",
    0x98: "Ÿ", 0x99: "Ž", 0x9A: "ı", 0x9B: "ł",
    0x9C: "œ", 0x9D: "š", 0x9E: "ž", 0xA0: "€",
})


def _decode_text(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1").translate(_PDFDOC_DELTA)


# ------------------------------------------------------------------ object values


def _parse_value(data: bytes, i: int):
    """Parse one PDF object value at ``i``. Returns (value, next_index).
    Values: dict → {name_str: value}, list, ("name", str), ("ref", int),
    bytes (strings), int/float, True/False/None. Unparseable input yields
    (None, i+1) — progress is always made, nothing raises."""
    n = len(data)
    i = _skip_ws(data, i)
    if i >= n:
        return None, n
    c = data[i]
    if c == 0x3C and i + 1 < n and data[i + 1] == 0x3C:  # <<
        i += 2
        d: dict = {}
        while True:
            i = _skip_ws(data, i)
            if i >= n:
                break
            if data[i] == 0x3E and i + 1 < n and data[i + 1] == 0x3E:
                i += 2
                break
            if data[i] != 0x2F:  # malformed key: skip one token
                _, i2 = _parse_value(data, i)
                i = max(i2, i + 1)
                continue
            key, i = _parse_name(data, i)
            val, i = _parse_value(data, i)
            d[key] = val
        return d, i
    if c == 0x5B:  # [
        i += 1
        arr = []
        while True:
            i = _skip_ws(data, i)
            if i >= n or data[i] == 0x5D:
                i = min(i + 1, n)
                break
            val, i2 = _parse_value(data, i)
            if i2 <= i:
                i2 = i + 1
            arr.append(val)
            i = i2
        return arr, i
    if c == 0x2F:  # /Name
        name, i = _parse_name(data, i)
        return ("name", name), i
    if c == 0x28:
        s, i = _parse_literal_string(data, i)
        return s, i
    if c == 0x3C:
        s, i = _parse_hex_string(data, i)
        return s, i
    if c in b"+-.0123456789":
        j = i + 1
        while j < n and data[j] in b"+-.0123456789":
            j += 1
        tok = data[i:j]
        try:
            num = int(tok)
        except ValueError:
            try:
                num = float(tok)
            except ValueError:
                return None, j
        # "N G R" indirect reference lookahead
        if isinstance(num, int) and num >= 0:
            k = _skip_ws(data, j)
            m = k
            while m < n and 0x30 <= data[m] <= 0x39:
                m += 1
            if m > k:
                m2 = _skip_ws(data, m)
                if m2 < n and data[m2 : m2 + 1] == b"R" and (
                    m2 + 1 >= n
                    or data[m2 + 1] in _WS
                    or data[m2 + 1] in _DELIM
                ):
                    return ("ref", num), m2 + 1
        return num, j
    for lit, val, ln in ((b"true", True, 4), (b"false", False, 5), (b"null", None, 4)):
        if data[i : i + ln] == lit:
            return val, i + ln
    return None, i + 1


def _parse_name(data: bytes, i: int) -> tuple[str, int]:
    """data[i] == '/'. #xx hex escapes per §7.3.5."""
    n = len(data)
    j = i + 1
    out = bytearray()
    while j < n and data[j] not in _WS and data[j] not in _DELIM:
        if data[j] == 0x23 and j + 2 < n:
            try:
                out.append(int(data[j + 1 : j + 3], 16))
                j += 3
                continue
            except ValueError:
                pass
        out.append(data[j])
        j += 1
    return out.decode("latin-1"), j


# ------------------------------------------------------------------ file structure


_STREAM_RE = re.compile(rb"\bstream(?:\r\n|\n|\r)")


def _parse_dict_tolerant(raw: bytes) -> dict:
    """Per-object isolation: one pathological object body (e.g. a
    nesting bomb that trips the recursion limit) must cost only ITS
    dict, not blank the whole document via the top-level backstop."""
    try:
        val, _ = _parse_value(raw, 0)
        return val if isinstance(val, dict) else {}
    except Exception:
        return {}


def _strip_stream_eol(stream: bytes) -> bytes:
    # spec: the EOL before endstream is not stream data
    if stream.endswith(b"\r\n"):
        return stream[:-2]
    if stream.endswith(b"\n") or stream.endswith(b"\r"):
        return stream[:-1]
    return stream


def _scan_objects(data: bytes) -> dict[int, tuple[dict, bytes | None]]:
    """Sequential xref-free object scan. Returns {obj_num: (dict, stream
    bytes or None)}; last definition of a number wins (incremental
    updates). Stream extent: a VALID integer ``/Length`` that lands on an
    ``endstream`` is trusted exactly; otherwise (bogus or indirect
    Length) the body runs to the nearest ``endstream``, or to EOF for a
    truncated tail. A ``consumed`` pointer skips spurious ``N G obj``
    byte patterns occurring INSIDE compressed stream data, so binary
    streams cannot spoof object boundaries. (``\\bstream`` cannot match
    inside ``endstream`` — no word boundary between 'd' and 's'.)"""
    objs: dict[int, tuple[dict, bytes | None]] = {}
    consumed = 0
    for m in _OBJ_RE.finditer(data):
        if m.start() < consumed:
            continue
        start = m.end()
        sm = _STREAM_RE.search(data, start)
        e_obj = data.find(b"endobj", start)
        has_stream = sm is not None and (e_obj == -1 or sm.start() < e_obj)
        stream = None
        if has_stream:
            dict_part = data[start : sm.start()]
            d = _parse_dict_tolerant(dict_part)
            s_start = sm.end()
            length = d.get("Length")
            end = None
            if isinstance(length, int) and 0 <= length <= len(data) - s_start:
                tail = data[s_start + length : s_start + length + 16]
                probe = tail.lstrip(b"\r\n \t")
                if probe.startswith(b"endstream"):
                    stream = data[s_start : s_start + length]
                    end = (
                        s_start + length + (len(tail) - len(probe)) + len(b"endstream")
                    )
            if end is None:  # bogus/indirect Length: nearest endstream
                es = data.find(b"endstream", s_start)
                if es == -1:  # truncated tail: salvage to EOF
                    stream = data[s_start:]
                    end = len(data)
                else:
                    stream = _strip_stream_eol(data[s_start:es])
                    end = es + len(b"endstream")
            consumed = end
        else:
            body_end = e_obj if e_obj != -1 else len(data)
            d = _parse_dict_tolerant(data[start:body_end])
            consumed = body_end
        try:
            num = int(m.group(1))
        except ValueError:  # unreachable given the regex; belt and braces
            continue
        objs[num] = (d, stream)
    _inflate_object_streams(objs)
    return objs


def _inflate_object_streams(objs: dict) -> None:
    """PDF ≥1.5 object streams (/Type /ObjStm, spec §7.5.7): most modern
    writers store the catalog/page-tree DICTS inside a compressed stream
    — invisible to the top-level scan. Decode each ObjStm, parse its
    ``N`` (objnum, offset) header pairs, and add the embedded objects.
    Directly-scanned definitions win over ObjStm ones (an incremental
    update appends direct objects; without xref generation bookkeeping
    that is the deterministic conservative policy). Embedded objects
    carry no streams (the spec forbids streams inside an ObjStm)."""
    for _num, (d, s) in sorted(objs.items()):
        if d.get("Type") != ("name", "ObjStm"):
            continue
        dec = _decode_stream(d, s)
        if not dec:
            continue
        n = d.get("N")
        first = d.get("First")
        if not isinstance(n, int) or not isinstance(first, int):
            continue
        n = min(max(n, 0), 100_000)  # adversarial-header cap
        pairs = []
        i = 0
        for _k in range(n):
            i = _skip_ws(dec, i)
            v1, i = _parse_value(dec, i)
            i = _skip_ws(dec, i)
            v2, i = _parse_value(dec, i)
            if isinstance(v1, int) and isinstance(v2, int):
                pairs.append((v1, v2))
            else:
                break
        for objnum, off in pairs:
            if objnum in objs:
                continue  # direct definitions win
            if not 0 <= first + off < len(dec):
                continue
            val, _ = _parse_value(dec, first + off)
            if isinstance(val, dict):
                objs[objnum] = (val, None)


def _filters_of(d: dict) -> list[str]:
    f = d.get("Filter")
    if f is None:
        return []
    if isinstance(f, tuple) and f[0] == "name":
        return [f[1]]
    if isinstance(f, list):
        return [x[1] for x in f if isinstance(x, tuple) and x[0] == "name"]
    return []


def _lzw_decode(data: bytes) -> bytes:
    """LZWDecode (§7.4.4.2): MSB-first variable-width codes, 256 =
    ClearTable, 257 = EOD, EarlyChange=1 (width bumps one code early).
    Corrupt input salvages the decoded prefix — never raises."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    bitbuf = bits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bits += 8
        while bits >= width:
            code = (bitbuf >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return bytes(out)  # corrupt: salvage prefix
                out += entry
                prev = entry
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]
                else:
                    return bytes(out)  # corrupt: salvage prefix
                out += entry
                table[next_code] = prev + entry[:1]
                next_code += 1
                prev = entry
            if next_code >= (1 << width) - 1 and width < 12:  # EarlyChange
                width += 1
        if len(out) > 64 << 20:  # decompression-bomb cap
            break
    return bytes(out)


_INFLATE_CAP = 64 << 20  # decompression-bomb cap, same budget as LZW


def _bounded_inflate(data: bytes, cap: int = _INFLATE_CAP) -> bytes | None:
    """FlateDecode with the LZW branch's bomb discipline: incremental
    decompressobj chunks so a crafted high-ratio stream cannot exhaust
    executor memory before the never-raise backstop sees it (a plain
    zlib.decompress has no output bound). Truncate-and-salvage on
    overflow; corrupt/truncated streams salvage the decoded prefix;
    None when nothing decodes."""
    d = zlib.decompressobj()
    out = bytearray()
    # feed INPUT in small chunks too: a zlib.error mid-call discards that
    # call's output, so chunked input bounds what a corrupt byte can cost
    # (truncated-but-valid prefixes decode without error either way)
    i, buf = 0, b""
    try:
        while True:
            if not buf:
                if i >= len(data):
                    break
                buf = bytes(data[i : i + 65536])
                i += 65536
            piece = d.decompress(buf, 1 << 20)
            out += piece
            if len(out) > cap:
                return bytes(out[:cap])  # bomb: keep the capped prefix
            buf = d.unconsumed_tail
            if d.eof:
                break
    except zlib.error:
        if not out:
            return None  # nothing salvageable
    return bytes(out)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode (§7.4.5): L ≤ 127 → copy L+1 literal bytes;
    L ≥ 129 → repeat next byte 257−L times; 128 = EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            out += data[i : i + length + 1]
            i += length + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


def _a85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3): 5 chars in ``!``..``u`` are base-85 digits
    of a 32-bit big-endian group; ``z`` is shorthand for four zero bytes
    (only between groups); ``~>`` is EOD; whitespace is ignored. A final
    partial group of n chars (2–4) is padded with ``u`` and yields n−1
    bytes. Forgiving: an out-of-range char or a lone trailing digit ends
    the decode with the prefix salvaged — never raises. Output is ≤ 4/5
    of input plus z-expansion bounded by input length, so no bomb cap is
    needed (each ``z`` costs one input byte for four output bytes)."""
    out = bytearray()
    group = []
    for c in data:
        if c in (0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x00):  # PDF whitespace
            continue
        if c == 0x7E:  # '~' — EOD marker (the '>' after it is ignored)
            break
        if c == 0x7A and not group:  # 'z' between groups
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:  # out of range: salvage the prefix
            break
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += (v & 0xFFFFFFFF).to_bytes(4, "big")
            group = []
    if len(group) >= 2:  # partial final group: pad with 'u' (84)
        n = len(group)
        v = 0
        for g in group + [84] * (5 - n):
            v = v * 85 + g
        out += (v & 0xFFFFFFFF).to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _decode_stream(d: dict, raw: bytes | None) -> bytes | None:
    if raw is None:
        return None
    data = raw
    for filt in _filters_of(d) or [None]:
        if filt is None:
            continue
        if filt in ("FlateDecode", "Fl"):
            data = _bounded_inflate(data)
            if data is None:
                return None
        elif filt in ("ASCIIHexDecode", "AHx"):
            end = data.find(b">")
            hx = data[: end if end != -1 else len(data)]
            hx = bytes(c for c in hx if c in b"0123456789abcdefABCDEF")
            if len(hx) % 2:
                hx += b"0"
            try:
                data = bytes.fromhex(hx.decode("ascii"))
            except ValueError:
                return None
        elif filt in ("ASCII85Decode", "A85"):
            if data[:2] == b"<~":  # optional Adobe-style lead-in
                data = data[2:]
            data = _a85_decode(data)
        elif filt in ("LZWDecode", "LZW"):
            data = _lzw_decode(data)
        elif filt in ("RunLengthDecode", "RL"):
            data = _rle_decode(data)
        else:  # unsupported filter (DCTDecode, JBIG2, …): not a text stream
            return None
    return data


def _deref(objs: dict, v, depth: int = 0):
    """Follow ("ref", n) chains to a concrete value (dicts stay dicts;
    a referenced stream object resolves to its dict)."""
    while isinstance(v, tuple) and len(v) == 2 and v[0] == "ref" and depth < 16:
        entry = objs.get(v[1])
        if entry is None:
            return None
        v = entry[0]
        depth += 1
    return v


def _parse_tounicode_cmap(dec: bytes) -> tuple[int, dict[int, str]]:
    """Parse a /ToUnicode CMap stream (PDF §9.10.3 / Adobe CMap spec):
    returns (code width in bytes, {code: unicode string}). Handles
    codespacerange (defines the width), bfchar pairs, and bfrange with
    either an incremented destination or an explicit array. Destination
    hex strings are UTF-16BE. Tolerant: malformed sections are skipped."""
    width = 2  # ToUnicode CMaps are overwhelmingly 2-byte (Identity-H)
    mapping: dict[int, str] = {}
    toks: list = []
    i = 0
    n = len(dec)
    while i < n:  # minimal CMap lexer: hex strings, arrays, keywords
        c = dec[i]
        if c in _WS:
            i += 1
        elif c == 0x25:
            while i < n and dec[i] not in b"\r\n":
                i += 1
        elif c == 0x3C and not (i + 1 < n and dec[i + 1] == 0x3C):
            s, i = _parse_hex_string(dec, i)
            toks.append(s)
        elif c == 0x5B:
            val, i = _parse_value(dec, i)
            toks.append(val if isinstance(val, list) else [])
        else:
            j = i
            while j < n and dec[j] not in _WS and dec[j] not in _DELIM:
                j += 1
            if j == i:
                i += 1
                continue
            toks.append(dec[i:j])
            i = j

    def _utf16(b: bytes) -> str:
        return b.decode("utf-16-be", errors="replace")

    def _inc(b: bytes, k: int) -> str:
        # spec: only the LAST code unit of the destination increments
        if len(b) < 2:
            return _utf16(b)
        last = int.from_bytes(b[-2:], "big") + k
        return _utf16(b[:-2] + (last & 0xFFFF).to_bytes(2, "big"))

    t = 0
    mode = None
    pend: list = []
    while t < len(toks):
        tok = toks[t]
        t += 1
        if isinstance(tok, bytes) and tok in (
            b"begincodespacerange", b"beginbfchar", b"beginbfrange"
        ):
            mode = tok
            pend = []
        elif isinstance(tok, bytes) and tok in (
            b"endcodespacerange", b"endbfchar", b"endbfrange"
        ):
            mode = None
        elif mode == b"begincodespacerange":
            if isinstance(tok, bytes):
                width = max(1, min(len(tok), 4))
        elif mode == b"beginbfchar":
            pend.append(tok)
            if len(pend) == 2:
                src, dst = pend
                pend = []
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    mapping[int.from_bytes(src, "big")] = _utf16(dst)
        elif mode == b"beginbfrange":
            pend.append(tok)
            if len(pend) == 3:
                lo, hi, dst = pend
                pend = []
                if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                    continue
                lo_i = int.from_bytes(lo, "big")
                hi_i = min(int.from_bytes(hi, "big"), lo_i + 65535)
                if isinstance(dst, bytes):
                    for k in range(hi_i - lo_i + 1):
                        mapping[lo_i + k] = _inc(dst, k)
                elif isinstance(dst, list):
                    for k, el in enumerate(dst):
                        if lo_i + k > hi_i:
                            break
                        if isinstance(el, bytes):
                            mapping[lo_i + k] = _utf16(el)
    return width, mapping


def _fonts_from_resources(objs: dict, res) -> dict[str, tuple[int, dict | None]]:
    """Resolve a /Resources dict's /Font table → {font name: (code
    width, ToUnicode mapping or None)}. Simple fonts default to 1-byte
    Latin-1 (no mapping); /Subtype /Type0 defaults to 2-byte codes even
    without a ToUnicode (decoded as UTF-16BE — the common case when the
    writer omitted the CMap but codes ARE unicode)."""
    fonts: dict[str, tuple[int, dict | None]] = {}
    if not isinstance(res, dict):
        return fonts
    fdict = _deref(objs, res.get("Font"))
    if not isinstance(fdict, dict):
        return fonts
    for name, fref in fdict.items():
        fobj = _deref(objs, fref)
        if not isinstance(fobj, dict):
            continue
        is_type0 = fobj.get("Subtype") == ("name", "Type0")
        width, mapping = (2 if is_type0 else 1), None
        tu = fobj.get("ToUnicode")
        if isinstance(tu, tuple) and tu[0] == "ref":
            entry = objs.get(tu[1])
            if entry is not None:
                dec = _decode_stream(entry[0], entry[1])
                if dec:
                    width, mapping = _parse_tounicode_cmap(dec)
        fonts[name] = (width, mapping)
    return fonts


def _xobjects_from_resources(
    objs: dict, res, inherited_fonts: dict, depth: int = 0,
    seen: frozenset = frozenset(),
) -> dict[str, tuple[bytes, dict, dict]]:
    """Resolve a /Resources dict's /XObject table to the FORM XObjects
    (§8.10 — headers, watermarks, and sometimes entire page bodies live
    in them): {name: (decoded content, fonts, nested xobjects)}. A
    form's own /Resources wins; absent one it inherits the caller's
    fonts (spec-sanctioned fallback). Depth-capped and cycle-guarded
    (a form referencing itself must not recurse forever)."""
    out: dict[str, tuple[bytes, dict, dict]] = {}
    if depth > 6 or not isinstance(res, dict):
        return out
    xdict = _deref(objs, res.get("XObject"))
    if not isinstance(xdict, dict):
        return out
    for name, xref in xdict.items():
        if not (isinstance(xref, tuple) and len(xref) == 2 and xref[0] == "ref"):
            continue
        if xref[1] in seen:
            continue
        entry = objs.get(xref[1])
        if entry is None:
            continue
        xd, xs = entry
        if xd.get("Subtype") != ("name", "Form"):
            continue  # images etc. carry no text
        blob = _decode_stream(xd, xs)
        if not blob:
            continue
        xres = _deref(objs, xd.get("Resources"))
        fonts = (
            _fonts_from_resources(objs, xres)
            if isinstance(xres, dict)
            else inherited_fonts
        )
        nested = _xobjects_from_resources(
            objs, xres if isinstance(xres, dict) else res, fonts,
            depth + 1, seen | {xref[1]},
        )
        out[name] = (blob, fonts, nested)
    return out


def _page_nodes(objs: dict) -> list[dict]:
    """Page dicts in document order — rungs 1+2 of the page-order
    ladder, independent of content-stream decodability (an encrypted
    document's page TREE is plain; only streams/strings are encrypted,
    so the page count survives when the text cannot)."""
    # rung 1: Root → Pages → Kids walk
    root_num = None
    for num, (d, _s) in objs.items():
        if d.get("Type") == ("name", "Catalog"):
            root_num = num
    pages: list[dict] = []
    if root_num is not None:
        cat = objs[root_num][0]
        seen: set[int] = set()

        def walk(node_ref, depth=0):
            if depth > 64:
                return
            if isinstance(node_ref, tuple) and node_ref[0] == "ref":
                if node_ref[1] in seen:
                    return
                seen.add(node_ref[1])
                entry = objs.get(node_ref[1])
                if entry is None:
                    return
                node = entry[0]
            elif isinstance(node_ref, dict):
                node = node_ref
            else:
                return
            t = node.get("Type")
            if t == ("name", "Page"):
                pages.append(node)
            else:  # Pages node (or typeless intermediate): recurse kids
                kids = node.get("Kids")
                if isinstance(kids, list):
                    for kid in kids:
                        walk(kid, depth + 1)

        walk(cat.get("Pages"))
    # rung 2: /Type/Page objects in file order
    if not pages:
        pages = [
            d for _num, (d, _s) in sorted(objs.items())
            if d.get("Type") == ("name", "Page")
        ]
    return pages


def _page_content_streams(objs: dict) -> list[tuple[bytes, dict, dict]]:
    """The page-order ladder. Returns one (decoded content blob, font
    table, form-XObject table) triple per page."""
    pages = _page_nodes(objs)
    out: list[tuple[bytes, dict]] = []
    for page in pages:
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if not (isinstance(r, tuple) and r and r[0] == "ref"):
                continue
            entry = objs.get(r[1])
            if entry is None:
                continue
            dec = _decode_stream(entry[0], entry[1])
            if dec:
                parts.append(dec)
        if parts:
            res = _deref(objs, page.get("Resources"))
            fonts = _fonts_from_resources(objs, res)
            xobs = _xobjects_from_resources(objs, res, fonts)
            out.append((b"\n".join(parts), fonts, xobs))
    # rung 3: any decoded stream containing a BT text object, file order
    if not out:
        for _num, (d, s) in sorted(objs.items()):
            dec = _decode_stream(d, s)
            if dec and b"BT" in dec:
                out.append((dec, {}, {}))
    return out


# ------------------------------------------------------------------ content streams


def _decode_with_font(raw: bytes, font: tuple[int, dict | None] | None) -> str:
    """Decode show-operator bytes through the ACTIVE font: simple fonts
    (or no font info) → the Latin-1/UTF-16BE-BOM path; multi-byte fonts
    → fixed-width code units mapped through the ToUnicode CMap, falling
    back to UTF-16BE for unmapped codes (the Identity-H-without-CMap
    reality); a trailing partial code unit is dropped (spec: ignore)."""
    if font is None:
        return _decode_text(raw)
    width, mapping = font
    if width <= 1 and mapping is None:
        return _decode_text(raw)
    if width <= 1:  # 1-byte font WITH a ToUnicode (e.g. symbolic simple font)
        return "".join(
            mapping.get(b, bytes([b]).decode("latin-1")) for b in raw
        )
    out = []
    for i in range(0, len(raw) - (len(raw) % width), width):
        code = int.from_bytes(raw[i : i + width], "big")
        if mapping is not None and code in mapping:
            out.append(mapping[code])
        else:
            out.append(
                raw[i : i + width].decode("utf-16-be", errors="replace")
                if width == 2
                else "�"
            )
    return "".join(out)


def _content_text_lines(
    data: bytes, fonts: dict | None = None, xobjects: dict | None = None
) -> list[str]:
    """Run the §9.4 text operators over one content stream; returns the
    emitted lines (y-motion = line break). ``fonts`` is the resolved
    font table ({name: (code width, ToUnicode mapping)}); the ``Tf``
    operator switches the active decoding. ``xobjects`` maps names to
    (blob, fonts, nested) FORM XObjects — a ``Do`` splices the form's
    text lines in place (recursion bounded by the resolver's depth cap
    and cycle guard)."""
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []
    arr: list | None = None
    in_text = False
    last_tm_y: float | None = None
    fonts = fonts or {}
    xobjects = xobjects or {}
    cur_font: tuple[int, dict | None] | None = None

    def flush():
        nonlocal cur
        if cur:
            line = "".join(cur)
            if line.strip():
                lines.append(line)
            cur = []

    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x25:  # comment
            while i < n and data[i] not in b"\r\n":
                i += 1
            continue
        if c == 0x28:
            s, i = _parse_literal_string(data, i)
            (arr if arr is not None else stack).append(s)
            continue
        if c == 0x3C and not (i + 1 < n and data[i + 1] == 0x3C):
            s, i = _parse_hex_string(data, i)
            (arr if arr is not None else stack).append(s)
            continue
        if c == 0x3C:  # << inline dict (BDC property lists etc.): parse+drop
            _d, i = _parse_value(data, i)
            continue
        if c == 0x5B:
            arr = []
            i += 1
            continue
        if c == 0x5D:
            if arr is not None:
                stack.append(arr)
                arr = None
            i += 1
            continue
        if c == 0x2F:
            name, i = _parse_name(data, i)
            (arr if arr is not None else stack).append(("name", name))
            continue
        if c in b"+-.0123456789":
            j = i + 1
            while j < n and data[j] in b"+-.0123456789":
                j += 1
            try:
                num = float(data[i:j])
            except ValueError:
                num = 0.0
            (arr if arr is not None else stack).append(num)
            i = j
            continue
        # operator keyword
        j = i
        while j < n and data[j] not in _WS and data[j] not in _DELIM:
            j += 1
        if j == i:  # stray delimiter: skip
            i += 1
            continue
        op = data[i:j]
        i = j
        if op == b"BT":
            in_text = True
            flush()
            last_tm_y = None
        elif op == b"ET":
            flush()
            in_text = False
        elif op == b"Tf":
            # operands: /FontName size — switch the active decoding
            if len(stack) >= 2 and isinstance(stack[-2], tuple):
                cur_font = fonts.get(stack[-2][1], cur_font)
        elif op == b"Do":
            # form XObject invocation: splice its text lines in place
            if stack and isinstance(stack[-1], tuple):
                xo = xobjects.get(stack[-1][1])
                if xo is not None:
                    flush()
                    lines.extend(_content_text_lines(xo[0], xo[1], xo[2]))
        elif in_text and op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                cur.append(_decode_with_font(stack[-1], cur_font))
        elif in_text and op == b"'":
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(_decode_with_font(stack[-1], cur_font))
        elif in_text and op == b'"':
            flush()
            if stack and isinstance(stack[-1], bytes):
                cur.append(_decode_with_font(stack[-1], cur_font))
        elif in_text and op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        cur.append(_decode_with_font(el, cur_font))
                    elif isinstance(el, float) and el <= -TJ_SPACE_KERN:
                        if cur and not cur[-1].endswith(" "):
                            cur.append(" ")
        elif in_text and op in (b"Td", b"TD"):
            if len(stack) >= 2 and isinstance(stack[-1], float):
                ty = stack[-1]
                tx = stack[-2] if isinstance(stack[-2], float) else 0.0
                if ty != 0.0:
                    flush()
                elif tx != 0.0 and cur and not cur[-1].endswith(" "):
                    cur.append(" ")  # x-only motion inside a line: word gap
        elif in_text and op == b"T*":
            flush()
        elif in_text and op == b"Tm":
            if len(stack) >= 6 and isinstance(stack[-1], float):
                ty = stack[-1]
                if last_tm_y is not None and ty != last_tm_y:
                    flush()
                last_tm_y = ty
        # every operator consumes its operands; clear to prevent leakage
        stack.clear()
        if len(lines) > 1_000_000:  # adversarial-input emission cap
            break
    flush()
    return lines


# ------------------------------------------------------------------ public surface


def _find_encrypt_dict(objs: dict, data: bytes):
    """Standard-security-handler detection (§7.6): the trailer's
    /Encrypt entry (any trailer — incremental updates may add one), with
    a keyed-dict fallback for trailer-less crawl PDFs — an encryption
    dict is the only object carrying /Filter together with the /O and
    /U owner/user password hashes. Returns the dict (possibly {}) when
    the document is encrypted, None otherwise."""
    t = data.rfind(b"trailer")
    while t != -1:
        td = _parse_dict_tolerant(data[t + 7 : t + 7 + 4096])
        v = td.get("Encrypt")
        if v is not None:
            d = _deref(objs, v)
            return d if isinstance(d, dict) else {}
        t = data.rfind(b"trailer", 0, t)
    for _num, (d, _s) in sorted(objs.items()):
        if "Filter" in d and "O" in d and "U" in d:
            return d
    return None


def pdf_is_encrypted(data) -> bool:
    """True when the document declares standard security (RC4/AES
    content encryption). Never raises; False when nothing parses."""
    try:
        if isinstance(data, str):
            data = data.encode("latin-1", errors="replace")
        if not isinstance(data, (bytes, bytearray, memoryview)):
            return False
        data = bytes(data)
        return _find_encrypt_dict(_scan_objects(data), data) is not None
    except Exception:  # engine contract: never raise
        return False


def extract_pdf(data) -> tuple[str, int]:
    """One parse → (text, n_pages). Never raises; ("", 0) when nothing
    parses. Pages joined with a blank line, lines with newlines;
    n_pages counts pages the page-order ladder found (with or without
    text). Encrypted documents (VERDICT r06 "What's missing" #2) yield
    ("", page-tree count): their streams/strings are RC4/AES ciphertext
    that would otherwise salvage-decode into garbage emitted into the
    corpus — forgiving means empty + flagged (``pdf_is_encrypted``),
    never garbage."""
    try:
        if isinstance(data, str):
            data = data.encode("latin-1", errors="replace")
        if not isinstance(data, (bytes, bytearray, memoryview)):
            return "", 0
        data = bytes(data)
        objs = _scan_objects(data)
        if _find_encrypt_dict(objs, data) is not None:
            return "", len(_page_nodes(objs))
        blobs = _page_content_streams(objs)
        pages = []
        for blob, fonts, xobs in blobs:
            lines = _content_text_lines(blob, fonts, xobs)
            if lines:
                pages.append("\n".join(lines))
        return "\n\n".join(pages), len(blobs)
    except Exception:  # absolute backstop: the engine contract is no-raise
        return "", 0


def extract_pdf_text(data) -> str:
    """Extract text from PDF bytes. Never raises; "" when nothing parses."""
    return extract_pdf(data)[0]


def pdf_page_count(data) -> int:
    """Number of pages the page-order ladder found. Never raises."""
    return extract_pdf(data)[1]


_INFO_KEYS = (
    "Title", "Author", "Subject", "Keywords", "Creator", "Producer",
    "CreationDate", "ModDate",
)


def pdf_info(data) -> dict[str, str]:
    """Document Information dictionary (§14.3.3) — see ``pdf_info_ex``;
    this wrapper drops the encrypted flag."""
    return pdf_info_ex(data)[0]


def pdf_info_ex(data) -> tuple[dict[str, str], bool]:
    """Document Information dictionary (§14.3.3) plus the encrypted
    flag, one parse: resolve the trailer's /Info reference — falling
    back to any dict carrying standard info keys and no /Type (crawled
    PDFs routinely lose their trailers) — and return the present
    standard entries decoded as text. Encrypted documents return
    ({}, True): their Info STRINGS are ciphertext (§7.6.2 encrypts all
    strings), so decoding them would emit mojibake metadata. Never
    raises; ({}, False) when nothing parses."""
    try:
        if isinstance(data, str):
            data = data.encode("latin-1", errors="replace")
        if not isinstance(data, (bytes, bytearray, memoryview)):
            return {}, False
        data = bytes(data)
        objs = _scan_objects(data)
        if _find_encrypt_dict(objs, data) is not None:
            return {}, True
        info = None
        t = data.rfind(b"trailer")
        if t != -1:
            td = _parse_dict_tolerant(data[t + 7 : t + 7 + 4096])
            ref = td.get("Info")
            if isinstance(ref, tuple) and len(ref) == 2 and ref[0] == "ref":
                entry = objs.get(ref[1])
                if entry is not None:
                    info = entry[0]
        if not isinstance(info, dict) or not any(k in info for k in _INFO_KEYS):
            for _num, (d, _s) in sorted(objs.items()):
                if "Type" not in d and any(k in d for k in _INFO_KEYS):
                    info = d
                    break
        out: dict[str, str] = {}
        if isinstance(info, dict):
            for k in _INFO_KEYS:
                v = info.get(k)
                if isinstance(v, bytes):
                    out[k] = _decode_text(v)
        return out, False
    except Exception:  # engine contract: never raise
        return {}, False
