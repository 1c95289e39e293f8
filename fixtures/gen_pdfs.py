"""Deterministic synthetic PDF fixture with independently composed
expected text (the gen_pages.py philosophy applied to the PDF leg of the
north rule's extraction tier).

Each row starts from LOGICAL page lines (seeded pseudo-sentences,
including Latin-1 accents and characters that need literal-string
escaping). The EXPECTED text is composed directly from those lines
("\\n" within a page, "\\n\\n" between pages) — while the PDF bytes are
built by an independent writer that encodes the same lines through
varied spec mechanisms the extractor must normalize away:

- show operators: plain ``(…) Tj``; word-split ``[(w) -250 (w)] TJ``
  (kern = word gap); hex-string ``<…> Tj``; ``'`` next-line-show;
  two-segment lines via an x-only ``Td`` (word gap, same line);
- escapes: ``\\( \\) \\\\``, an octal-escaped char, Latin-1 bytes;
- line motion: ``0 -14 Td`` vs ``T*`` (with ``14 TL``);
- stream encoding: raw, FlateDecode (zlib), ASCIIHexDecode,
  ASCII85Decode (stdlib base64.a85encode — independent of the engine's
  decoder), and the chained ``[/ASCII85Decode /FlateDecode]`` form
  common in crawled PDFs;
- file structure: 1–3 pages; a correct xref table, or a deliberately
  GARBAGE xref (the extractor is xref-free), or junk bytes prepended
  before %PDF (both appear constantly in crawled PDFs); ~1/3 of rows
  use the modern PDF-1.5+ layout with the catalog/page-tree dicts
  inside a compressed /Type/ObjStm object stream (spec §7.5.7 — how
  most crawled PDFs actually ship their page dicts); ~1/4 of rows use a
  Type0 CID font: every line shown as 2-byte codes through a
  FlateDecode /ToUnicode CMap the extractor must parse (§9.10.3 — the
  CJK/subset-font layout); ~1/5 of rows start every page with a /Do of
  a shared Form XObject running header (§8.10) the extractor must
  splice in place.

Corrupted/truncated PDFs are exercised by the never-raise unit battery
(tests/test_pdf.py), not here — a corrupt payload has no independently
composable expectation.
"""

from __future__ import annotations

import base64
import os
import random
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "pdfs")
PDF_FIXTURE_VERSION = "7"
N_ROWS = 120

_WORDS = (
    "spark catalyst tungsten shuffle partition executor arrow batch "
    "corpus crawl extract parse token lineage resume checkpoint "
    "résumé naïve café jalapeño Zürich façade "
    "value(x) path\\seg (nested) a=b*c"
).split()


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _garble(b: bytes, num: int) -> bytes:
    """Deterministic RC4-stand-in for /Encrypt rows: XOR with an
    object-keyed repeating keystream. No crypto lib — the point is only
    that the stored stream/string bytes are NOT the plaintext (nor valid
    flate), exactly like real standard-security ciphertext, so an
    extractor that ignores /Encrypt emits garbage."""
    key = bytes(((num * 73 + j * 151 + 29) & 0xFF) for j in range(16))
    return bytes(c ^ key[j % 16] for j, c in enumerate(b))


def _esc_bytes(b: bytes) -> str:
    """Escape arbitrary ciphertext bytes for a literal string: octal
    escapes keep CR/LF/parens/backslash unambiguous."""
    return "".join(f"\\{c:03o}" for c in b)


def _line_ops(line: str, rng: random.Random) -> str:
    """Encode one logical line as show-operator ops (no line motion)."""
    mode = rng.randrange(5)
    if mode == 0:
        return f"({_esc(line)}) Tj"
    if mode == 1 and " " in line:
        words = line.split(" ")
        parts = " -250 ".join(f"({_esc(w)})" for w in words)
        return f"[{parts}] TJ"
    if mode == 2:
        hx = line.encode("latin-1", errors="replace").hex()
        return f"<{hx}> Tj"
    if mode == 3 and " " in line:
        # two segments joined by an x-only Td (word gap, same line)
        k = line.index(" ")
        a, b = line[:k], line[k + 1 :]
        return f"({_esc(a)}) Tj 40 0 Td ({_esc(b)}) Tj"
    # octal-escape the first character
    first = line[0]
    code = ord(first.encode("latin-1", errors="replace"))
    return f"(\\{code:03o}{_esc(line[1:])}) Tj"


def _page_content(lines: list[str], rng: random.Random) -> bytes:
    use_tstar = rng.random() < 0.5
    ops = ["BT", "/F1 12 Tf", "14 TL", "72 720 Td"]
    for idx, line in enumerate(lines):
        if idx:
            ops.append("T*" if use_tstar else "0 -14 Td")
        ops.append(_line_ops(line, rng))
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _objstm(embedded: list[tuple[int, bytes]]) -> bytes:
    """Pack (objnum, dict body) pairs into a FlateDecode /Type/ObjStm
    object body (spec §7.5.7: N (objnum, offset) header pairs, objects
    at /First + offset)."""
    bodies = b""
    header_parts = []
    for num, body in embedded:
        header_parts.append(f"{num} {len(bodies)}")
        bodies += body + b"\n"
    header = (" ".join(header_parts)).encode() + b"\n"
    raw = header + bodies
    comp = zlib.compress(raw, 6)
    return (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
        b"\nstream\n%s\nendstream" % (len(embedded), len(header), len(comp), comp)
    )


def _page_content_cid(lines: list[str], code_of: dict[str, int]) -> bytes:
    """Page content for the CID-font variant: every line shown as 2-byte
    codes through /FC (decoded via the ToUnicode CMap)."""
    ops = ["BT", "/FC 12 Tf", "14 TL", "72 720 Td"]
    for idx, line in enumerate(lines):
        if idx:
            ops.append("T*")
        hx = "".join(f"{code_of[ch]:04x}" for ch in line)
        ops.append(f"<{hx}> Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _tounicode_stream(code_of: dict[str, int]) -> bytes:
    pairs = "\n".join(
        f"<{code:04x}> <{ch.encode('utf-16-be').hex()}>"
        for ch, code in sorted(code_of.items(), key=lambda kv: kv[1])
    )
    cmap = (
        "/CIDInit /ProcSet findresource begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        f"{len(code_of)} beginbfchar\n{pairs}\nendbfchar\n"
        "endcmap\nend"
    ).encode("latin-1")
    comp = zlib.compress(cmap, 6)
    return (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(comp), comp)
    )


def _make_pdf(
    pages: list[list[str]],
    rng: random.Random,
    use_cid: bool = False,
    form_header: str | None = None,
    info: dict[str, str] | None = None,
    encrypt: bool = False,
) -> bytes:
    """Assemble a complete PDF: catalog, page tree, per-page content
    streams (encoding drawn per stream), xref (sometimes garbage),
    sometimes junk before the header — and sometimes the modern PDF-1.5+
    layout where the catalog/page-tree DICTS live inside a compressed
    /Type/ObjStm object stream (most crawled PDFs) while content streams
    stay direct."""
    n_pages = len(pages)
    kid_nums = [3 + 2 * p for p in range(n_pages)]
    font_num, tounicode_num = 2 * n_pages + 4, 2 * n_pages + 5
    form_num = 2 * n_pages + 6
    code_of: dict[str, int] = {}
    if use_cid:
        chars = sorted({ch for ls in pages for line in ls for ch in line})
        code_of = {ch: i + 1 for i, ch in enumerate(chars)}
    use_form = form_header is not None
    info_num = 2 * n_pages + 7
    res = ""
    if use_cid:
        res = f" /Resources << /Font << /FC {font_num} 0 R >> >>"
    elif use_form:
        res = f" /Resources << /XObject << /XH {form_num} 0 R >> >>"
    dict_objs: list[tuple[int, bytes]] = [(1, b"<< /Type /Catalog /Pages 2 0 R >>")]
    kids = " ".join(f"{k} 0 R" for k in kid_nums)
    dict_objs.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    )
    stream_objs: list[tuple[int, bytes]] = []
    if info:
        if encrypt:  # §7.6.2: strings are encrypted too — store ciphertext
            body = " ".join(
                f"/{k} ({_esc_bytes(_garble(v.encode('latin-1', 'replace'), info_num))})"
                for k, v in sorted(info.items())
            )
        else:
            body = " ".join(f"/{k} ({_esc(v)})" for k, v in sorted(info.items()))
        stream_objs.append((info_num, f"<< {body} >>".encode("latin-1")))
    encrypt_num = 2 * n_pages + 8
    if encrypt:
        o_esc = _esc_bytes(_garble(bytes(range(32)), encrypt_num))
        u_esc = _esc_bytes(_garble(bytes(range(32, 64)), encrypt_num + 1))
        stream_objs.append(
            (
                encrypt_num,
                (
                    f"<< /Filter /Standard /V 1 /R 2 /Length 40 /P -44 "
                    f"/O ({o_esc}) /U ({u_esc}) >>"
                ).encode("latin-1"),
            )
        )
    if use_form:
        fbody = _page_content([form_header], rng)
        stream_objs.append(
            (
                form_num,
                b"<< /Subtype /Form /Length %d >>\nstream\n%s\nendstream"
                % (len(fbody), fbody),
            )
        )
    if use_cid:
        stream_objs.append(
            (
                font_num,
                (
                    f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
                    f"/Encoding /Identity-H /ToUnicode {tounicode_num} 0 R >>"
                ).encode(),
            )
        )
        stream_objs.append((tounicode_num, _tounicode_stream(code_of)))
    for p, lines in enumerate(pages):
        content_num = kid_nums[p] + 1
        dict_objs.append(
            (
                kid_nums[p],
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {content_num} 0 R{res} >>"
                ).encode(),
            )
        )
        raw = (
            _page_content_cid(lines, code_of)
            if use_cid
            else _page_content(lines, rng)
        )
        if use_form:
            raw = b"/XH Do\n" + raw
        enc = rng.randrange(5)
        if encrypt:
            # stored data = Encrypt(Deflate(content)) per the spec's
            # filter-then-encrypt order: ciphertext that is NOT valid flate
            body = _garble(zlib.compress(raw, 6), content_num)
            filt = b" /Filter /FlateDecode"
        elif enc == 0:
            body, filt = raw, b""
        elif enc == 1:
            body, filt = zlib.compress(raw, 6), b" /Filter /FlateDecode"
        elif enc == 2:
            body, filt = raw.hex().encode() + b">", b" /Filter /ASCIIHexDecode"
        elif enc == 3:
            # stdlib a85 encoder — independent of engine/pdf._a85_decode
            body = base64.a85encode(raw) + b"~>"
            filt = b" /Filter /ASCII85Decode"
        else:
            # the chained form crawled PDFs actually use: flate then a85
            body = base64.a85encode(zlib.compress(raw, 6)) + b"~>"
            filt = b" /Filter [/ASCII85Decode /FlateDecode]"
        stream_objs.append(
            (
                content_num,
                b"<< /Length %d%s >>\nstream\n%s\nendstream"
                % (len(body), filt, body),
            )
        )
    # encrypted rows keep the classic layout: a real encrypted ObjStm is
    # itself ciphertext, which would hide the page TREE too — the fixture
    # pins the "n_pages from the plain page tree" contract instead
    if rng.random() < 0.35 and not encrypt:  # modern layout: ObjStm dicts
        objstm_num = 2 * n_pages + 3
        objs = [(objstm_num, _objstm(dict_objs))] + stream_objs
    else:
        objs = sorted(dict_objs + stream_objs)

    head = b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"
    if rng.random() < 0.2:  # crawl reality: junk before the header
        head = b"HTTP/1.1 200 OK\r\nX-Junk: yes\r\n\r\n" + head
    out = bytearray(head)
    offsets = []
    for num, body in objs:
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    if rng.random() < 0.3:  # garbage xref: extractor must not care
        out += b"xref\n0 1\n9999999999 00000 n \n"
    else:
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
    info_ref = b" /Info %d 0 R" % info_num if info else b""
    enc_ref = b" /Encrypt %d 0 R" % encrypt_num if encrypt else b""
    out += b"trailer\n<< /Size %d /Root 1 0 R%s%s >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1,
        info_ref,
        enc_ref,
        xref_at,
    )
    return bytes(out)


def draw_pdf_row(i: int):
    """One (pdf_id, pdf_bytes, expected_text, n_pages, title, producer,
    creation_date, encrypted) row — the metadata three None when the row
    has no Info dict OR is encrypted (Info strings are ciphertext);
    encrypted rows expect empty text with n_pages from the plain page
    tree."""
    rng = random.Random(0xC0FFEE + i)
    n_pages = rng.randint(1, 3)
    pages = []
    for _p in range(n_pages):
        n_lines = rng.randint(2, 6)
        lines = []
        for _l in range(n_lines):
            k = rng.randint(3, 8)
            lines.append(" ".join(rng.choice(_WORDS) for _ in range(k)))
        pages.append(lines)
    # variants drawn HERE so the expectation composes independently:
    # CID (~1/4): 2-byte codes through a ToUnicode CMap; form header
    # (~1/5, exclusive): every page starts with a /Do'd running header
    use_cid = rng.random() < 0.25
    form_header = None
    if not use_cid and rng.random() < 0.2:
        form_header = " ".join(rng.choice(_WORDS) for _ in range(3))
    eff_pages = (
        [[form_header] + ls for ls in pages] if form_header else pages
    )
    expected = "\n\n".join("\n".join(ls) for ls in eff_pages)
    # document-information dict (~3/4 of rows): composed HERE, so the
    # expected metadata columns are independent of the extractor
    info = None
    if rng.random() < 0.75:
        info = {
            "Title": " ".join(rng.choice(_WORDS) for _ in range(2)),
            "Producer": f"synthwriter {i % 3}.{i % 7}",
            "CreationDate": f"D:2024{1 + i % 12:02d}{1 + i % 28:02d}090000Z",
        }
    # drawn AFTER every other draw so non-encrypted rows keep the exact
    # byte stream of fixture v5 (~15% of rows become /Encrypt variants)
    encrypted = rng.random() < 0.15
    pdf = _make_pdf(
        pages, rng, use_cid=use_cid, form_header=form_header, info=info,
        encrypt=encrypted,
    )
    if encrypted:
        expected = ""  # ciphertext streams: empty text, never garbage
    meta = {} if encrypted else (info or {})
    return (
        i, pdf, expected, n_pages,
        meta.get("Title"), meta.get("Producer"), meta.get("CreationDate"),
        encrypted,
    )


def ensure_pdfs() -> str:
    """Generate + cache the fixture parquet. Returns its path."""
    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, "pdfs.parquet")
    marker = os.path.join(DATA_DIR, "_DONE")
    if os.path.exists(marker) and os.path.exists(path):
        with open(marker) as f:
            if f.read().strip() == PDF_FIXTURE_VERSION:
                return path
    rows = [draw_pdf_row(i) for i in range(N_ROWS)]
    pq.write_table(
        pa.table(
            {
                "pdf_id": pa.array([r[0] for r in rows], pa.int64()),
                "pdf": pa.array([r[1] for r in rows], pa.binary()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "n_pages": pa.array([r[3] for r in rows], pa.int32()),
                "title": pa.array([r[4] for r in rows], pa.string()),
                "producer": pa.array([r[5] for r in rows], pa.string()),
                "creation_date": pa.array([r[6] for r in rows], pa.string()),
                "encrypted": pa.array([r[7] for r in rows], pa.bool_()),
            }
        ),
        path,
    )
    with open(marker, "w") as f:
        f.write(PDF_FIXTURE_VERSION)
    return path


if __name__ == "__main__":
    p = ensure_pdfs()
    t = pq.read_table(p)
    print(p, t.num_rows, "rows,", sum(len(x) for x in t.column("pdf").to_pylist()), "pdf bytes")
