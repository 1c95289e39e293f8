"""HTML character-reference (entity) decoding — engine milestone M1.

Capability parity with the reference's entity layer (src/html/entities.d
[recalled]: WHATWG named-entity table + decode helpers). The named-entity
data itself is the public WHATWG set, sourced from the Python stdlib
(``html.entities.html5``) rather than re-embedding a 2k-line table.

Pinned semantics (fixture-defined, see FIXTURES.md family 2 and
tests/test_entities.py — the reference checkout is absent in this sandbox,
so these rules ARE the byte-identity contract):

- A character reference requires the terminating ``;``.  ``&amp`` without a
  semicolon stays literal text (do NOT use ``html.unescape``, which also
  matches legacy semicolon-less forms — SURVEY.md §2.A.1 T12).
- Unknown names (``&notareal;``) stay literal.
- Numeric: ``&#65;`` / ``&#x41;`` / ``&#X41;``. Codepoint 0, surrogates
  (U+D800–U+DFFF) and > U+10FFFF are invalid → the whole reference stays
  literal (forgiving: never raise).
- Decoded output is UTF-8 bytes (the engine works byte-level end to end).

All functions are allocation-light: decode returns ``None`` to mean "leave
the input bytes as-is", so the common no-entity path never copies.
"""

from __future__ import annotations

from html.entities import html5 as _HTML5

# Only names WITH the trailing ';' (the strict forms). Keys stored without
# the ';' for direct slice lookup; values pre-encoded to UTF-8.
NAMED_ENTITIES: dict[bytes, bytes] = {
    name[:-1].encode("ascii"): value.encode("utf-8")
    for name, value in _HTML5.items()
    if name.endswith(";")
}

# Longest strict entity name (CounterClockwiseContourIntegral = 31 chars).
MAX_NAME_LEN: int = max(len(n) for n in NAMED_ENTITIES)

_SEMI = 0x3B  # ';'
_HASH = 0x23  # '#'

_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")
_DEC_DIGITS = frozenset(b"0123456789")


def _valid_codepoint(cp: int) -> bool:
    return 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF)


def decode_entity(buf: bytes, pos: int) -> tuple[bytes, int] | None:
    """Try to decode a character reference starting at ``buf[pos] == ord('&')``.

    Returns ``(decoded_utf8_bytes, end_pos)`` where ``end_pos`` is the index
    just past the terminating ``;``, or ``None`` if no valid reference starts
    here (caller keeps the ``&`` literal). Never raises on malformed input.
    """
    n = len(buf)
    i = pos + 1
    if i >= n:
        return None
    c = buf[i]
    if c == _HASH:
        i += 1
        if i >= n:
            return None
        if buf[i] in (0x78, 0x58):  # 'x' / 'X'
            i += 1
            start = i
            while i < n and buf[i] in _HEX_DIGITS:
                i += 1
            if i == start or i >= n or buf[i] != _SEMI:
                return None
            cp = int(buf[start:i], 16)
        else:
            start = i
            while i < n and buf[i] in _DEC_DIGITS:
                i += 1
            if i == start or i >= n or buf[i] != _SEMI:
                return None
            cp = int(buf[start:i])
        if not _valid_codepoint(cp):
            return None
        return chr(cp).encode("utf-8"), i + 1
    # Named: find ';' within the longest possible name.
    semi = buf.find(b";", i, i + MAX_NAME_LEN + 1)
    if semi < 0:
        return None
    decoded = NAMED_ENTITIES.get(buf[i:semi])
    if decoded is None:
        return None
    return decoded, semi + 1


def decode_entities(buf: bytes) -> bytes:
    """Decode every valid character reference in ``buf`` (used for attribute
    values and RCDATA). Invalid references are left literal. Zero-copy when
    no ``&`` is present."""
    amp = buf.find(b"&")
    if amp < 0:
        return buf
    out: list[bytes] = []
    pos = 0
    n = len(buf)
    while amp >= 0:
        hit = decode_entity(buf, amp)
        if hit is None:
            amp = buf.find(b"&", amp + 1)
            continue
        decoded, end = hit
        out.append(buf[pos:amp])
        out.append(decoded)
        pos = end
        amp = buf.find(b"&", pos)
    out.append(buf[pos:n])
    return b"".join(out)
