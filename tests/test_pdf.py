"""PDF text extraction engine (engine/pdf.py): fixture parity, the
never-raise contract on adversarial bytes, and spec-corner behaviors
(escapes, hex strings, TJ kerning, Tm line breaks, page-order ladder,
incremental updates, stream-length tolerance)."""

import random
import zlib

from hypothesis import given, settings, strategies as st

from fixtures.gen_pdfs import N_ROWS, draw_pdf_row
from htmld_spark.engine.pdf import extract_pdf_text, pdf_page_count


def _pdf(objects: list[bytes], trailer_root: bool = True) -> bytes:
    out = bytearray(b"%PDF-1.7\n")
    for num, body in enumerate(objects, 1):
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    if trailer_root:
        out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def _one_page(content: bytes) -> bytes:
    return _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        ]
    )


def test_fixture_parity_and_determinism():
    """Every fixture row extracts byte-identically to the independently
    composed expectation, twice (deterministic)."""
    for i in range(N_ROWS):
        _pid, pdf, expected, n_pages, *_meta = draw_pdf_row(i)
        assert extract_pdf_text(pdf) == expected, f"row {i}"
        assert extract_pdf_text(pdf) == expected, f"row {i} (rerun)"
        assert pdf_page_count(pdf) == n_pages, f"row {i} pages"


def test_never_raises_on_adversarial_bytes():
    rng = random.Random(7)
    _pid, pdf, *_rest = draw_pdf_row(0)
    payloads = [
        b"",
        b"%PDF-1.7",
        bytes(range(256)) * 64,
        bytes(rng.randrange(256) for _ in range(4096)),
        b"(" * 100_000,
        b"1 0 obj\n<< /Length 99999999 >>\nstream\nabc",  # truncated stream
        b"1 0 obj\n<< " * 5000,  # deep dict nesting attempt
        b"[" * 50_000 + b"]" * 10,
        b"1 0 obj << /Type /Page >>",  # no endobj, no contents
        pdf[: len(pdf) // 2],  # truncated mid-file
        pdf[:-40],  # truncated tail
        None,
        12345,
        "a string, not bytes",
    ]
    # bit-flip corruption of a real fixture PDF at 50 seeded positions
    for _ in range(50):
        b = bytearray(pdf)
        b[rng.randrange(len(b))] ^= 0xFF
        payloads.append(bytes(b))
    for p in payloads:
        t = extract_pdf_text(p)
        assert isinstance(t, str)
        assert extract_pdf_text(p) == t  # deterministic even on garbage
        assert isinstance(pdf_page_count(p), int)


def test_string_escapes_and_hex():
    content = (
        rb"BT ( a\(b\)c\\d\101e ) Tj T* <48656c6c6f2> Tj ET"
    )  # odd hex digit count pads with 0 -> "Hello" + \x20
    out = extract_pdf_text(_one_page(content))
    assert out == " a(b)c\\dAe \nHello "


def test_line_continuation_and_octal_overflow():
    content = b"BT (ab\\\ncd) Tj T* (\\777x) Tj ET"  # \777 & 0xFF = 0xFF
    out = extract_pdf_text(_one_page(content))
    assert out == "abcd\n\xffx"


def test_utf16be_string():
    s = "héllo".encode("utf-16-be")
    content = b"BT <feff" + s.hex().encode() + b"> Tj ET"
    assert extract_pdf_text(_one_page(content)) == "héllo"


def test_tj_kern_threshold():
    """Kern <= -180 is a word gap; smaller magnitudes are intra-word."""
    content = b"BT [(a) -250 (b) -100 (c)] TJ ET"
    assert extract_pdf_text(_one_page(content)) == "a bc"


def test_tm_y_change_breaks_line():
    content = (
        b"BT 1 0 0 1 72 720 Tm (one) Tj 1 0 0 1 72 700 Tm (two) Tj "
        b"1 0 0 1 300 700 Tm (three) Tj ET"
    )
    assert extract_pdf_text(_one_page(content)) == "one\ntwothree"


def test_text_outside_bt_et_ignored():
    content = b"(nope) Tj BT (yes) Tj ET (also nope) Tj"
    assert extract_pdf_text(_one_page(content)) == "yes"


def test_page_tree_order_beats_file_order():
    """Kids order defines page order even when objects are stored
    reversed in the file."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 16 >>\nstream\nBT (second) Tj ET\nendstream",
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        b"<< /Length 15 >>\nstream\nBT (first) Tj ET\nendstream",
    ]
    assert extract_pdf_text(_pdf(objs)) == "first\n\nsecond"


def test_fallback_rung2_no_catalog():
    objs = [
        b"<< /Type /Page /Contents 2 0 R >>",
        b"<< >>\nstream\nBT (orphan page) Tj ET\nendstream",
    ]
    assert extract_pdf_text(_pdf(objs, trailer_root=False)) == "orphan page"


def test_fallback_rung3_bare_stream():
    raw = b"1 0 obj\n<< >>\nstream\nBT (bare) Tj ET\nendstream\nendobj\n"
    assert extract_pdf_text(raw) == "bare"
    assert pdf_page_count(raw) == 1


def test_incremental_update_last_definition_wins():
    base = _one_page(b"BT (old) Tj ET")
    update = (
        b"4 0 obj\n<< /Length 14 >>\nstream\nBT (new) Tj ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text(base + update) == "new"


def test_bogus_length_falls_back_to_endstream():
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 999999 >>\nstream\nBT (tolerant) Tj ET\nendstream",
    ]
    assert extract_pdf_text(_pdf(objs)) == "tolerant"


def test_flate_corrupt_tail_salvages_prefix():
    good = zlib.compress(b"BT (salvaged line) Tj T* (lost) Tj ET", 6)
    corrupt = good[: len(good) - 6]  # drop the deflate tail + adler
    content = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(corrupt), corrupt)
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        content,
    ]
    out = extract_pdf_text(_pdf(objs))
    assert "salvaged" in out  # prefix decoded despite the corrupt tail


def test_objstm_embedded_page_dicts():
    """PDF ≥1.5 object streams: catalog + page-tree dicts live inside a
    compressed /Type/ObjStm; only content streams are direct objects.
    The extractor must inflate the ObjStm to find the pages — and a
    direct definition of the same objnum must win over the embedded one."""
    embedded = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    ]
    bodies = b""
    header_parts = []
    for num, body in embedded:
        header_parts.append(f"{num} {len(bodies)}")
        bodies += body + b"\n"
    header = (" ".join(header_parts)).encode() + b"\n"
    comp = zlib.compress(header + bodies, 6)
    objstm = (
        b"<< /Type /ObjStm /N 3 /First %d /Length %d /Filter /FlateDecode >>"
        b"\nstream\n%s\nendstream" % (len(header), len(comp), comp)
    )
    content = b"BT (from objstm) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        + b"5 0 obj\n" + objstm + b"\nendobj\n"
        + b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(content), content)
    )
    assert extract_pdf_text(pdf) == "from objstm"
    assert pdf_page_count(pdf) == 1
    # direct definition of objnum 3 overrides the embedded page dict
    # (points Contents at a different stream)
    override = (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n"
        b"6 0 obj\n<< /Length 21 >>\nstream\nBT (direct wins) Tj ET\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf + override) == "direct wins"


def test_binary_stream_cannot_spoof_objects():
    """Compressed bytes containing 'N G obj' / 'endobj' byte patterns
    must not clobber real objects (the consumed-pointer rule)."""
    evil = zlib.compress(b"x" * 10 + b"\n3 0 obj\n<< /Type /Page >>\nendobj\n" + b"y" * 10)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(evil), evil),
        b"<< /Length 14 >>\nstream\nBT (txt) Tj ET\nendstream",
    ]
    # page 3's contents (obj 4) decode to non-text noise; the real obj 3
    # definition must survive the spoofed copy inside the stream
    out = extract_pdf_text(_pdf(objs))
    assert isinstance(out, str)
    assert pdf_page_count(_pdf(objs)) == 1


_BASE_PDF = draw_pdf_row(1)[1]


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_hypothesis_never_raises_on_binary(data):
    t = extract_pdf_text(data)
    assert isinstance(t, str)
    assert extract_pdf_text(data) == t


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=len(_BASE_PDF) - 1),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=64),
)
def test_hypothesis_mutated_real_pdf_never_raises(pos, byte, cut):
    """Real fixture PDF with one byte overwritten and/or the tail cut —
    the shapes real crawls produce. Never raises, stays deterministic."""
    b = bytearray(_BASE_PDF)
    b[pos] = byte
    mutated = bytes(b[: max(1, len(b) - cut)])
    t = extract_pdf_text(mutated)
    assert isinstance(t, str)
    assert extract_pdf_text(mutated) == t
    assert isinstance(pdf_page_count(mutated), int)


def test_pathological_object_does_not_blank_document():
    """One nesting-bomb object must cost only its own dict — the valid
    page in the same file still extracts (per-object parse isolation,
    not just the top-level backstop)."""
    bomb = b"9 0 obj\n" + b"<< /A " * 4000 + b"\nendobj\n"
    good = _one_page(b"BT (still here) Tj ET")
    assert extract_pdf_text(good + bomb) == "still here"
    assert extract_pdf_text(bomb + good) == "still here"


def _tounicode_cmap(mapping: dict[int, str]) -> bytes:
    pairs = "\n".join(
        f"<{code:04x}> <{dst.encode('utf-16-be').hex()}>"
        for code, dst in mapping.items()
    )
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        b"%d beginbfchar\n%s\nendbfchar\n"
        b"endcmap\nend" % (len(mapping), pairs.encode())
    )


def test_type0_tounicode_cmap():
    """A Type0 font with a /ToUnicode CMap: 2-byte codes map through
    bfchar entries; an UNMAPPED code falls back to UTF-16BE; Tf switches
    decoding between the CID font and a simple Latin-1 font."""
    cmap = _tounicode_cmap({1: "H", 2: "i", 3: "日", 4: " "})
    codes = bytes.fromhex("0001000200040003")  # H i ␠ 日
    content = (
        b"BT /F0 12 Tf <" + codes.hex().encode() + b"> Tj "
        b"T* /F1 12 Tf (plain latin) Tj ET"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F0 5 0 R /F1 6 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
        b"/ToUnicode 7 0 R >>",
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(_tounicode_cmap({1: "H", 2: "i", 3: "日", 4: " "})),
           _tounicode_cmap({1: "H", 2: "i", 3: "日", 4: " "})),
    ]
    assert extract_pdf_text(_pdf(objs)) == "Hi 日\nplain latin"
    # unmapped code 0x0041 in a Type0 WITHOUT ToUnicode → UTF-16BE "A"
    objs2 = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F0 5 0 R >> >> >>",
        b"<< /Length 26 >>\nstream\nBT /F0 9 Tf <00410042> Tj ET\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /NoCMap >>",
    ]
    assert extract_pdf_text(_pdf(objs2)) == "AB"


def test_bfrange_incremented_and_array():
    """bfrange destination forms: <lo> <hi> <dst> increments the last
    UTF-16 unit; <lo> <hi> [..] maps positionally."""
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0061>\n"              # 0x10..0x12 -> a b c
        b"<0020> <0021> [<0058> <0059>]\n"     # 0x20, 0x21 -> X Y
        b"endbfrange\nendcmap"
    )
    content = b"BT /F0 9 Tf <001000110012> Tj T* <00200021> Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F0 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    ]
    assert extract_pdf_text(_pdf(objs)) == "abc\nXY"


def _lzw_encode(data: bytes) -> bytes:
    """Minimal LZW encoder (EarlyChange=1) for the decoder test."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out_bits = []

    def emit(code, w):
        out_bits.append((code, w))

    emit(256, width)  # ClearTable
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        w = c
    if w:
        emit(table[w], width)
    emit(257, width)  # EOD
    bitbuf = bits = 0
    out = bytearray()
    for code, wd in out_bits:
        bitbuf = (bitbuf << wd) | code
        bits += wd
        while bits >= 8:
            out.append((bitbuf >> (bits - 8)) & 0xFF)
            bits -= 8
    if bits:
        out.append((bitbuf << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_and_rle_filters():
    content = b"BT (lzw text here) Tj ET"
    lzw = _lzw_encode(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d /Filter /LZWDecode >>\nstream\n%s\nendstream"
        % (len(lzw), lzw),
    ]
    assert extract_pdf_text(_pdf(objs)) == "lzw text here"
    # RunLengthDecode: literal run + repeat run
    rle_content = b"BT (rle " + b"a" * 6 + b") Tj ET"
    lit, rep = rle_content[:8], rle_content[8:]  # "BT (rle " + "aaaaaa) Tj ET"
    enc = bytes([len(lit) - 1]) + lit + bytes([257 - 6, ord("a")])
    enc += bytes([len(rep[6:]) - 1]) + rep[6:] + b"\x80"
    objs[3] = (
        b"<< /Length %d /Filter /RunLengthDecode >>\nstream\n%s\nendstream"
        % (len(enc), enc)
    )
    assert extract_pdf_text(_pdf(objs)) == "rle aaaaaa"


def test_ascii85_filter_and_chain():
    """ASCII85Decode (§7.4.3): plain, z-shorthand, Adobe <~ lead-in,
    whitespace interleave, and the [/ASCII85Decode /FlateDecode] chain
    crawled PDFs actually use. The encoder is stdlib base64.a85encode —
    independent of engine/pdf._a85_decode."""
    import base64
    import zlib

    from htmld_spark.engine.pdf import _a85_decode

    content = b"BT (a85 text \x00\x00\x00\x00 here) Tj ET"
    a85 = base64.a85encode(content) + b"~>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d /Filter /ASCII85Decode >>\nstream\n%s\nendstream"
        % (len(a85), a85),
    ]
    assert extract_pdf_text(_pdf(objs)) == "a85 text \x00\x00\x00\x00 here"
    chained = base64.a85encode(zlib.compress(content)) + b"~>"
    objs[3] = (
        b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>"
        b"\nstream\n%s\nendstream" % (len(chained), chained)
    )
    assert extract_pdf_text(_pdf(objs)) == "a85 text \x00\x00\x00\x00 here"
    # decoder unit contract vs the stdlib round-trip
    for payload in (b"", b"x", b"ab", b"abc", b"abcd", b"abcde",
                    b"\x00" * 17, bytes(range(256))):
        assert _a85_decode(base64.a85encode(payload) + b"~>") == payload
        assert _a85_decode(base64.a85encode(payload)) == payload  # no EOD
    # Adobe lead-in is stripped at the dispatch layer; whitespace ignored
    spaced = b" ".join(bytes([c]) for c in base64.a85encode(b"sure."))
    assert _a85_decode(spaced + b"\n~>") == b"sure."
    # forgiveness: out-of-range char and lone trailing digit salvage
    assert _a85_decode(base64.a85encode(b"sure.") + b"\xff\xffjunk") in (
        b"sure.", b"sure",
    )
    ok = base64.a85encode(b"abcd")
    assert _a85_decode(ok + b"F") == b"abcd"  # 1 leftover digit: dropped
    assert _a85_decode(b"v" * 10) == b""  # all out of range: empty, no raise


def test_form_xobject_do_splices_text():
    """A /Do of a Form XObject splices the form's lines (its own fonts);
    a self-referencing form must not loop."""
    form = b"BT /FF 9 Tf (from form) Tj ET"
    content = b"BT (before) Tj ET /X1 Do BT (after) Tj ET"
    cmap = _tounicode_cmap({})  # empty map; form font is 1-byte simple
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /XObject << /X1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Subtype /Form /Length %d "
        b"/Resources << /Font << /FF 6 0 R >> /XObject << /X1 5 0 R >> >> >>"
        b"\nstream\n%s\nendstream" % (len(form), form),
        b"<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
    ]
    assert extract_pdf_text(_pdf(objs)) == "before\nfrom form\nafter"
    # self-reference inside the form: cycle guard, still extracts once
    form2 = b"BT (looped) Tj ET /X1 Do"
    objs[4] = (
        b"<< /Subtype /Form /Length %d "
        b"/Resources << /XObject << /X1 5 0 R >> >> >>"
        b"\nstream\n%s\nendstream" % (len(form2), form2)
    )
    assert extract_pdf_text(_pdf(objs)) == "before\nlooped\nafter"


def test_pdf_info_metadata():
    """Info dict via trailer /Info; keyed-dict fallback when the trailer
    is lost; absent keys omitted; garbage → {}."""
    from htmld_spark.engine.pdf import pdf_info

    base = _one_page(b"BT (x) Tj ET")
    with_info = base.replace(
        b"trailer\n<< /Root 1 0 R >>",
        b"9 0 obj\n<< /Title (T\\351st) /Producer (w 1.0) >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R /Info 9 0 R >>",
    )
    assert pdf_info(with_info) == {"Title": "Tést", "Producer": "w 1.0"}
    # trailer lost (truncated past the info object): fallback scan
    no_trailer = with_info[: with_info.rfind(b"trailer")]
    assert pdf_info(no_trailer)["Title"] == "Tést"
    assert pdf_info(base) == {}
    assert pdf_info(b"\x00garbage") == {}
    # fixture parity: metadata columns replayed exactly
    for i in (0, 7, 42):
        row = draw_pdf_row(i)
        info = pdf_info(row[1])
        assert info.get("Title") == row[4] and info.get("Producer") == row[5]


def test_pdfdoc_encoding_punctuation_block():
    """PDFDocEncoding's 0x80–0xA0 punctuation block (spec Annex D.2):
    smart quotes, dashes and the ellipsis decode to their real code
    points, not Latin-1 C1 controls; plain Latin-1 accents unchanged."""
    content = b"BT (\x8dsmart\x8e \x84 dash \x83 caf\xe9 \xa01) Tj ET"
    assert extract_pdf_text(_one_page(content)) == "“smart” — dash … café €1"


# ------------------------------------------------------------- /Encrypt (r7)


def test_encrypted_pdf_empty_text_page_count():
    """VERDICT r06 missing #2: /Encrypt docs must yield EMPTY text (their
    streams are ciphertext that would salvage-decode to garbage) while
    n_pages still comes from the plain page tree."""
    from htmld_spark.engine.pdf import extract_pdf, pdf_is_encrypted

    from fixtures.gen_pdfs import N_ROWS

    seen_enc = 0
    for i in range(N_ROWS):
        row = draw_pdf_row(i)
        pdf, expected, n_pages, enc = row[1], row[2], row[3], row[7]
        assert pdf_is_encrypted(pdf) == enc, f"row {i}"
        if enc:
            seen_enc += 1
            assert expected == ""
            t, n = extract_pdf(pdf)
            assert t == "" and n == n_pages, f"row {i}: {t[:40]!r} {n}"
    assert seen_enc >= 5  # the fixture actually exercises the branch


def test_encrypt_trailer_detection_and_metadata_suppression():
    """Hand-built /Encrypt doc: trailer ref detection; pdf_info_ex
    returns ({}, True) — Info strings are ciphertext, mojibake must not
    become corpus metadata. Keyed-dict fallback catches a trailer-less
    variant (the /O + /U + /Filter signature)."""
    from htmld_spark.engine.pdf import pdf_info_ex, pdf_is_encrypted

    enc_obj = (
        b"<< /Filter /Standard /V 1 /R 2 /Length 40 /P -44 "
        b"/O (\\001\\002garbled) /U (\\003\\004garbled) >>"
    )
    doc = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length 20 >>\nstream\n\x88\x99\xaa\xbb ciphertext\nendstream",
            enc_obj,
            b"<< /Title (\\x8f\\x9eciphered) /Producer (junk) >>",
        ],
        trailer_root=False,
    ) + b"trailer\n<< /Root 1 0 R /Encrypt 5 0 R /Info 6 0 R >>\n%%EOF\n"
    assert pdf_is_encrypted(doc)
    assert extract_pdf_text(doc) == ""
    assert pdf_page_count(doc) == 1
    assert pdf_info_ex(doc) == ({}, True)
    # trailer-less: the keyed-dict fallback still detects it
    no_trailer = doc[: doc.rfind(b"trailer")]
    assert pdf_is_encrypted(no_trailer)
    assert extract_pdf_text(no_trailer) == ""
    # plain docs stay un-flagged
    assert not pdf_is_encrypted(_one_page(b"BT (x) Tj ET"))


def test_encrypt_mutations_never_raise():
    """Fuzz: /Encrypt spliced into real fixture rows at random spots —
    detection may flip either way but nothing raises and the result is
    deterministic."""
    from htmld_spark.engine.pdf import pdf_info_ex, pdf_is_encrypted

    rng = random.Random(0xE7C)
    frags = [
        b"/Encrypt 99 0 R",
        b"trailer\n<< /Encrypt 1 0 R >>",
        b"<< /Filter /Standard /O () /U () >>",
        b"9 0 obj\n<< /Filter /Standard /O (x) /U (y) >>\nendobj\n",
    ]
    for i in range(12):
        base = draw_pdf_row(i)[1]
        for frag in frags:
            pos = rng.randrange(len(base))
            mutated = base[:pos] + frag + base[pos:]
            t = extract_pdf_text(mutated)
            assert extract_pdf_text(mutated) == t  # deterministic
            assert isinstance(pdf_is_encrypted(mutated), bool)
            info, flag = pdf_info_ex(mutated)
            assert isinstance(info, dict) and isinstance(flag, bool)


def test_flate_bomb_capped():
    """ADVICE r06: a high-ratio flate stream must not exhaust executor
    memory — the decode is truncated at the 64 MiB cap, document intact."""
    from htmld_spark.engine.pdf import _INFLATE_CAP, _bounded_inflate

    bomb = zlib.compress(b"\x00" * (_INFLATE_CAP + (8 << 20)), 9)
    out = _bounded_inflate(bomb)
    assert out is not None and len(out) == _INFLATE_CAP
    # full pipeline: bomb content stream → capped, never raises
    content = b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (
        len(bomb), bomb,
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        content,
    ]
    assert isinstance(extract_pdf_text(_pdf(objs)), str)
