/* C accelerator for the engine's hot path: tokenize + DOM build fused
 * (engine/tokenizer.py + engine/dom.py DOMBuilder, DEFAULT options only).
 *
 * This is a performance twin, not a second engine: it replicates the
 * pinned pure-Python semantics byte for byte (the fixture corpus and
 * tests/test_native_parity.py enforce full-arena equality against the
 * Python builder). Non-default ParserOptions/DOMOptions fall back to the
 * Python path in parse_document; any build/load failure falls back too,
 * so the engine never depends on a working C toolchain.
 *
 * Exported function:
 *   parse(html: bytes, named_entities: dict[bytes, bytes],
 *         max_name_len: int) -> tuple
 * returning the 14 Document arena columns + total_text_len:
 *   (kind, tag, tag_raw, attrs, content, parent, first_child, last_child,
 *    next_sib, prev_sib, raw_start, raw_end, text_start, text_end,
 *    total_text_len)
 * with int columns as plain Python lists (identical layout to the
 * Python DOMBuilder) — every downstream consumer (selector engine,
 * main_text, spans, serializer, mutation API) is unchanged.
 */

#define PY_SSIZE_T_CLEAN
#define _GNU_SOURCE /* memmem */
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* node kinds (engine/dom.py) */
#define K_DOC 0
#define K_ELEM 1
#define K_TEXT 2
#define K_COMMENT 3
#define K_CDATA 4
#define K_DOCTYPE 5
#define K_PI 6
#define K_DECL 7

#define NID_NULL (-1)

/* ---- byte classes (tokenizer.py) ---------------------------------- */
static inline int is_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f';
}
static inline int is_letter(unsigned char c) {
    return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
/* _NAME_END = ws / '/' / '>' */
static inline int is_name_end(unsigned char c) {
    return is_ws(c) || c == '/' || c == '>';
}
static inline unsigned char lower1(unsigned char c) {
    return (c >= 'A' && c <= 'Z') ? (unsigned char)(c + 32) : c;
}

/* ---- implied-end bit classification (dom.py IMPLIED_END) ---------- */
#define B_P 0x001u
#define B_LI 0x002u
#define B_DTDD 0x004u
#define B_CELL 0x008u
#define B_TR 0x010u
#define B_SECT 0x020u
#define B_OPTION 0x040u
#define B_OPTGROUP 0x080u

static int tag_is(const unsigned char *p, Py_ssize_t len, const char *lit) {
    return (Py_ssize_t)strlen(lit) == len && memcmp(p, lit, (size_t)len) == 0;
}

/* bits describing the tag itself as a potential closee on the stack */
static unsigned int closee_bits(const unsigned char *p, Py_ssize_t len) {
    switch (len) {
    case 1:
        if (p[0] == 'p') return B_P;
        return 0;
    case 2:
        if (p[0] == 'l' && p[1] == 'i') return B_LI;
        if (p[0] == 'd' && (p[1] == 't' || p[1] == 'd')) return B_DTDD;
        if (p[0] == 't') {
            if (p[1] == 'd' || p[1] == 'h') return B_CELL;
            if (p[1] == 'r') return B_TR;
        }
        return 0;
    case 5:
        if (tag_is(p, len, "thead") || tag_is(p, len, "tbody") ||
            tag_is(p, len, "tfoot"))
            return B_SECT;
        return 0;
    case 6:
        if (tag_is(p, len, "option")) return B_OPTION;
        return 0;
    case 8:
        if (tag_is(p, len, "optgroup")) return B_OPTGROUP;
        return 0;
    default:
        return 0;
    }
}

/* _P_CLOSERS membership (26 block tags whose opening closes an open <p>) */
static int is_p_closer(const unsigned char *p, Py_ssize_t len) {
    switch (len) {
    case 1:
        return p[0] == 'p';
    case 2:
        if (p[0] == 'h' && p[1] >= '1' && p[1] <= '6') return 1; /* h1..h6 */
        return tag_is(p, len, "dl") || tag_is(p, len, "hr") ||
               tag_is(p, len, "ol") || tag_is(p, len, "ul");
    case 3:
        return tag_is(p, len, "div") || tag_is(p, len, "nav") ||
               tag_is(p, len, "pre");
    case 4:
        return tag_is(p, len, "form") || tag_is(p, len, "main") ||
               tag_is(p, len, "menu");
    case 5:
        return tag_is(p, len, "aside") || tag_is(p, len, "table");
    case 6:
        return tag_is(p, len, "figure") || tag_is(p, len, "footer") ||
               tag_is(p, len, "header") || tag_is(p, len, "hgroup");
    case 7:
        return tag_is(p, len, "address") || tag_is(p, len, "article") ||
               tag_is(p, len, "details") || tag_is(p, len, "section");
    case 8:
        return tag_is(p, len, "fieldset");
    case 10:
        return tag_is(p, len, "blockquote") || tag_is(p, len, "figcaption");
    default:
        return 0;
    }
}

/* closers mask for an OPENING tag (IMPLIED_END[name]) */
static unsigned int closer_mask(const unsigned char *p, Py_ssize_t len) {
    switch (len) {
    case 2:
        if (p[0] == 'l' && p[1] == 'i') return B_LI | B_P;
        if (p[0] == 'd' && (p[1] == 't' || p[1] == 'd')) return B_DTDD | B_P;
        if (p[0] == 't') {
            if (p[1] == 'r') return B_CELL | B_TR;
            if (p[1] == 'd' || p[1] == 'h') return B_CELL;
        }
        break;
    case 5:
        if (tag_is(p, len, "thead") || tag_is(p, len, "tbody") ||
            tag_is(p, len, "tfoot"))
            return B_CELL | B_TR | B_SECT;
        break;
    case 6:
        if (tag_is(p, len, "option")) return B_OPTION;
        break;
    case 8:
        if (tag_is(p, len, "optgroup")) return B_OPTION | B_OPTGROUP;
        break;
    default:
        break;
    }
    /* _P_CLOSERS → {p} via setdefault (never overrides the table above) */
    if (is_p_closer(p, len)) return B_P;
    return 0;
}

/* VOID_ELEMENTS (dom.py) */
static int is_void(const unsigned char *p, Py_ssize_t len) {
    switch (len) {
    case 2:
        return tag_is(p, len, "br") || tag_is(p, len, "hr");
    case 3:
        return tag_is(p, len, "col") || tag_is(p, len, "img") ||
               tag_is(p, len, "wbr");
    case 4:
        return tag_is(p, len, "area") || tag_is(p, len, "base") ||
               tag_is(p, len, "link") || tag_is(p, len, "meta");
    case 5:
        return tag_is(p, len, "embed") || tag_is(p, len, "input") ||
               tag_is(p, len, "param") || tag_is(p, len, "track");
    case 6:
        return tag_is(p, len, "keygen") || tag_is(p, len, "source");
    default:
        return 0;
    }
}

/* RAW_TEXT_TAGS = script style xmp; RCDATA_TAGS = title textarea */
static int is_raw_text(const unsigned char *p, Py_ssize_t len) {
    return tag_is(p, len, "script") || tag_is(p, len, "style") ||
           tag_is(p, len, "xmp");
}
static int is_rcdata(const unsigned char *p, Py_ssize_t len) {
    return tag_is(p, len, "title") || tag_is(p, len, "textarea");
}

/* ---- growable arena ----------------------------------------------- */
typedef struct {
    int64_t *kind, *parent, *fc, *lc, *ns, *ps, *rs, *re, *ts, *te;
    PyObject **tag, **tag_raw, **attrs, **content; /* owned refs or NULL */
    Py_ssize_t cnt, cap;
} Arena;

static int arena_grow(Arena *a) {
    Py_ssize_t ncap = a->cap ? a->cap * 2 : 256;
#define GROW_I(f)                                                           \
    do {                                                                    \
        int64_t *t = (int64_t *)realloc(a->f, (size_t)ncap * sizeof(int64_t)); \
        if (!t) return -1;                                                  \
        a->f = t;                                                           \
    } while (0)
#define GROW_O(f)                                                           \
    do {                                                                    \
        PyObject **t =                                                      \
            (PyObject **)realloc(a->f, (size_t)ncap * sizeof(PyObject *));  \
        if (!t) return -1;                                                  \
        a->f = t;                                                           \
    } while (0)
    GROW_I(kind); GROW_I(parent); GROW_I(fc); GROW_I(lc); GROW_I(ns);
    GROW_I(ps); GROW_I(rs); GROW_I(re); GROW_I(ts); GROW_I(te);
    GROW_O(tag); GROW_O(tag_raw); GROW_O(attrs); GROW_O(content);
#undef GROW_I
#undef GROW_O
    a->cap = ncap;
    return 0;
}

/* mirrors DOMBuilder._alloc exactly */
static Py_ssize_t arena_alloc(Arena *a, int kind, Py_ssize_t parent,
                              int64_t raw_s, int64_t raw_e, int64_t txt) {
    if (a->cnt >= a->cap && arena_grow(a) < 0) return -1;
    Py_ssize_t nid = a->cnt++;
    a->kind[nid] = kind;
    a->tag[nid] = NULL;
    a->tag_raw[nid] = NULL;
    a->attrs[nid] = NULL;
    a->content[nid] = NULL;
    a->parent[nid] = parent;
    a->fc[nid] = NID_NULL;
    a->ns[nid] = NID_NULL;
    {
        int64_t prev = a->lc[parent];
        a->ps[nid] = prev;
        if (prev != NID_NULL)
            a->ns[prev] = nid;
        else
            a->fc[parent] = nid;
    }
    a->lc[nid] = NID_NULL;
    a->lc[parent] = nid;
    a->rs[nid] = raw_s;
    a->re[nid] = raw_e;
    a->ts[nid] = txt;
    a->te[nid] = txt;
    return nid;
}

/* ---- growable byte buffer (pending text, D8 folding) --------------- */
typedef struct {
    unsigned char *p;
    size_t len, cap;
} Buf;

static int buf_put(Buf *b, const unsigned char *src, size_t n) {
    if (b->len + n > b->cap) {
        size_t ncap = b->cap ? b->cap : 256;
        while (ncap < b->len + n) ncap *= 2;
        unsigned char *t = (unsigned char *)realloc(b->p, ncap);
        if (!t) return -1;
        b->p = t;
        b->cap = ncap;
    }
    memcpy(b->p + b->len, src, n);
    b->len += n;
    return 0;
}

/* ---- open-element stack ------------------------------------------- */
typedef struct {
    int64_t nid;
    unsigned int bits;     /* closee bits of this tag */
    int32_t tag_off;       /* offset of lowercase tag name in `low` */
    int32_t tag_len;
} StackEnt;

typedef struct {
    StackEnt *p;
    Py_ssize_t len, cap;
} Stack;

static int stack_push(Stack *s, int64_t nid, unsigned int bits, int32_t off,
                      int32_t len) {
    if (s->len >= s->cap) {
        Py_ssize_t ncap = s->cap ? s->cap * 2 : 64;
        StackEnt *t = (StackEnt *)realloc(s->p, (size_t)ncap * sizeof(StackEnt));
        if (!t) return -1;
        s->p = t;
        s->cap = ncap;
    }
    s->p[s->len].nid = nid;
    s->p[s->len].bits = bits;
    s->p[s->len].tag_off = off;
    s->p[s->len].tag_len = len;
    s->len++;
    return 0;
}

/* ---- parser state -------------------------------------------------- */
typedef struct {
    const unsigned char *html;
    const unsigned char *low;
    Py_ssize_t n;
    Arena a;
    Stack stack;
    Buf buf; /* pending text bytes */
    int has_pending;
    int64_t buf_start, buf_end;
    int64_t text_len;
    PyObject *named;   /* NAMED_ENTITIES dict (borrowed) */
    Py_ssize_t max_name_len;
    int oom; /* a Python-level error is pending */
} P;

/* find byte c in [from, to) of html; -1 if absent */
static inline Py_ssize_t find_byte(const unsigned char *h, Py_ssize_t from,
                                   Py_ssize_t to, unsigned char c) {
    if (from < 0) from = 0;
    if (from >= to) return -1;
    const unsigned char *r =
        (const unsigned char *)memchr(h + from, c, (size_t)(to - from));
    return r ? (Py_ssize_t)(r - h) : -1;
}

/* ---- entity decoding (entities.py decode_entity) ------------------- */
/* Returns 1 and fills out/out_len/end when a valid reference starts at
 * pos; 0 otherwise. For named entities, *out borrows from the dict value
 * (data pointer valid while dict alive); for numeric, *out points at
 * numbuf. */
static int decode_entity_at(P *st, const unsigned char *buf, Py_ssize_t n,
                            Py_ssize_t pos, const unsigned char **out,
                            Py_ssize_t *out_len, Py_ssize_t *end,
                            unsigned char numbuf[4]) {
    Py_ssize_t i = pos + 1;
    if (i >= n) return 0;
    unsigned char c = buf[i];
    if (c == '#') {
        i++;
        if (i >= n) return 0;
        int64_t cp = 0;
        int overflow = 0;
        if (buf[i] == 'x' || buf[i] == 'X') {
            i++;
            Py_ssize_t start = i;
            while (i < n) {
                unsigned char d = buf[i];
                int v;
                if (d >= '0' && d <= '9') v = d - '0';
                else if (d >= 'a' && d <= 'f') v = d - 'a' + 10;
                else if (d >= 'A' && d <= 'F') v = d - 'A' + 10;
                else break;
                if (cp > 0x110000) overflow = 1; else cp = cp * 16 + v;
                i++;
            }
            if (i == start || i >= n || buf[i] != ';') return 0;
        } else {
            Py_ssize_t start = i;
            while (i < n && buf[i] >= '0' && buf[i] <= '9') {
                if (cp > 0x110000) overflow = 1; else cp = cp * 10 + (buf[i] - '0');
                i++;
            }
            if (i == start || i >= n || buf[i] != ';') return 0;
        }
        if (overflow || cp <= 0 || cp > 0x10FFFF ||
            (cp >= 0xD800 && cp <= 0xDFFF))
            return 0;
        /* UTF-8 encode */
        if (cp < 0x80) {
            numbuf[0] = (unsigned char)cp;
            *out_len = 1;
        } else if (cp < 0x800) {
            numbuf[0] = 0xC0 | (cp >> 6);
            numbuf[1] = 0x80 | (cp & 0x3F);
            *out_len = 2;
        } else if (cp < 0x10000) {
            numbuf[0] = 0xE0 | (cp >> 12);
            numbuf[1] = 0x80 | ((cp >> 6) & 0x3F);
            numbuf[2] = 0x80 | (cp & 0x3F);
            *out_len = 3;
        } else {
            numbuf[0] = 0xF0 | (cp >> 18);
            numbuf[1] = 0x80 | ((cp >> 12) & 0x3F);
            numbuf[2] = 0x80 | ((cp >> 6) & 0x3F);
            numbuf[3] = 0x80 | (cp & 0x3F);
            *out_len = 4;
        }
        *out = numbuf;
        *end = i + 1;
        return 1;
    }
    /* named: find ';' within [i, i + max_name_len + 1) */
    {
        Py_ssize_t lim = i + st->max_name_len + 1;
        if (lim > n) lim = n;
        Py_ssize_t semi = find_byte(buf, i, lim, ';');
        if (semi < 0) return 0;
        PyObject *key =
            PyBytes_FromStringAndSize((const char *)buf + i, semi - i);
        if (!key) {
            st->oom = 1;
            return 0;
        }
        PyObject *val = PyDict_GetItem(st->named, key); /* borrowed */
        Py_DECREF(key);
        if (!val) return 0;
        *out = (const unsigned char *)PyBytes_AS_STRING(val);
        *out_len = PyBytes_GET_SIZE(val);
        *end = semi + 1;
        return 1;
    }
}

/* ---- builder callbacks (DOMBuilder, fused) ------------------------- */
static inline int sink_text(P *st, Py_ssize_t s, Py_ssize_t e) {
    if (!st->has_pending) {
        st->buf_start = s;
        st->has_pending = 1;
    }
    if (buf_put(&st->buf, st->html + s, (size_t)(e - s)) < 0) return -1;
    st->buf_end = e;
    return 0;
}

static inline int sink_entity(P *st, Py_ssize_t s, Py_ssize_t e,
                              const unsigned char *dec, Py_ssize_t dec_len) {
    if (!st->has_pending) {
        st->buf_start = s;
        st->has_pending = 1;
    }
    if (buf_put(&st->buf, dec, (size_t)dec_len) < 0) return -1;
    st->buf_end = e;
    return 0;
}

static int flush_text(P *st) {
    if (!st->has_pending) return 0;
    Py_ssize_t top = st->stack.p[st->stack.len - 1].nid;
    Py_ssize_t nid = arena_alloc(&st->a, K_TEXT, top, st->buf_start,
                                 st->buf_end, st->text_len);
    if (nid < 0) return -1;
    PyObject *content = PyBytes_FromStringAndSize((const char *)st->buf.p,
                                                  (Py_ssize_t)st->buf.len);
    if (!content) {
        st->oom = 1;
        return -1;
    }
    st->a.content[nid] = content;
    st->text_len += (int64_t)st->buf.len;
    st->a.te[nid] = st->text_len;
    st->buf.len = 0;
    st->has_pending = 0;
    return 0;
}

/* _emit_text: text region [start, end) with char-ref splitting */
static int emit_text(P *st, Py_ssize_t start, Py_ssize_t end, int entities) {
    if (!entities) {
        if (end > start) return sink_text(st, start, end);
        return 0;
    }
    Py_ssize_t pos = start;
    Py_ssize_t amp = find_byte(st->html, pos, end, '&');
    while (amp >= 0) {
        const unsigned char *dec;
        Py_ssize_t dec_len, ent_end;
        unsigned char numbuf[4];
        int hit = decode_entity_at(st, st->html, st->n, amp, &dec, &dec_len,
                                   &ent_end, numbuf);
        if (st->oom) return -1;
        if (hit && ent_end <= end) {
            if (amp > pos && sink_text(st, pos, amp) < 0) return -1;
            if (sink_entity(st, amp, ent_end, dec, dec_len) < 0) return -1;
            pos = ent_end;
            amp = find_byte(st->html, pos, end, '&');
        } else {
            amp = find_byte(st->html, amp + 1, end, '&');
        }
    }
    if (end > pos) return sink_text(st, pos, end);
    return 0;
}

/* _simple: COMMENT / DOCTYPE / DECL / PI nodes */
static int simple_node(P *st, int kind, Py_ssize_t s, Py_ssize_t e) {
    if (flush_text(st) < 0) return -1;
    Py_ssize_t top = st->stack.p[st->stack.len - 1].nid;
    Py_ssize_t nid = arena_alloc(&st->a, kind, top, s, e, st->text_len);
    if (nid < 0) return -1;
    Py_ssize_t len = e > s ? e - s : 0;
    PyObject *content =
        PyBytes_FromStringAndSize((const char *)st->html + s, len);
    if (!content) {
        st->oom = 1;
        return -1;
    }
    st->a.content[nid] = content;
    return 0;
}

static int on_cdata(P *st, Py_ssize_t s, Py_ssize_t e) {
    if (flush_text(st) < 0) return -1;
    Py_ssize_t top = st->stack.p[st->stack.len - 1].nid;
    Py_ssize_t nid = arena_alloc(&st->a, K_CDATA, top, s, e, st->text_len);
    if (nid < 0) return -1;
    Py_ssize_t len = e > s ? e - s : 0;
    PyObject *content =
        PyBytes_FromStringAndSize((const char *)st->html + s, len);
    if (!content) {
        st->oom = 1;
        return -1;
    }
    st->a.content[nid] = content;
    st->text_len += (int64_t)len;
    st->a.te[nid] = st->text_len;
    return 0;
}

/* on_close (D6) */
static int on_close(P *st, Py_ssize_t name_off, Py_ssize_t name_len,
                    Py_ssize_t s, Py_ssize_t e) {
    if (flush_text(st) < 0) return -1;
    Stack *sk = &st->stack;
    for (Py_ssize_t depth = sk->len - 1; depth >= 1; depth--) {
        StackEnt *ent = &sk->p[depth];
        if (ent->tag_len == name_len &&
            memcmp(st->low + ent->tag_off, st->low + name_off,
                   (size_t)name_len) == 0) {
            while (sk->len - 1 > depth) {
                StackEnt *top = &sk->p[--sk->len];
                st->a.re[top->nid] = s;
                st->a.te[top->nid] = st->text_len;
            }
            StackEnt *top = &sk->p[--sk->len];
            st->a.re[top->nid] = e;
            st->a.te[top->nid] = st->text_len;
            return 0;
        }
    }
    return 0; /* not found → ignore */
}

/* decode_entities for an attribute value [vs, ve) of html; returns new
 * PyBytes (zero-copy slice when no '&'), NULL on error. */
static PyObject *decode_attr_value(P *st, Py_ssize_t vs, Py_ssize_t ve) {
    const unsigned char *b = st->html + vs;
    Py_ssize_t len = ve - vs;
    const unsigned char *amp0 =
        len > 0 ? (const unsigned char *)memchr(b, '&', (size_t)len) : NULL;
    if (!amp0) return PyBytes_FromStringAndSize((const char *)b, len);
    Buf out = {0};
    Py_ssize_t pos = 0;
    Py_ssize_t amp = (Py_ssize_t)(amp0 - b);
    while (amp >= 0) {
        const unsigned char *dec;
        Py_ssize_t dec_len, ent_end;
        unsigned char numbuf[4];
        int hit =
            decode_entity_at(st, b, len, amp, &dec, &dec_len, &ent_end, numbuf);
        if (st->oom) {
            free(out.p);
            return NULL;
        }
        if (!hit) {
            amp = find_byte(b, amp + 1, len, '&');
            continue;
        }
        if (buf_put(&out, b + pos, (size_t)(amp - pos)) < 0 ||
            buf_put(&out, dec, (size_t)dec_len) < 0) {
            free(out.p);
            st->oom = 1;
            return NULL;
        }
        pos = ent_end;
        amp = find_byte(b, pos, len, '&');
    }
    if (buf_put(&out, b + pos, (size_t)(len - pos)) < 0) {
        free(out.p);
        st->oom = 1;
        return NULL;
    }
    PyObject *r =
        PyBytes_FromStringAndSize((const char *)out.p, (Py_ssize_t)out.len);
    free(out.p);
    if (!r) st->oom = 1;
    return r;
}

/* on_open: emits the element; returns 0/-1 */
static int on_open(P *st, Py_ssize_t name_off, Py_ssize_t name_len,
                   Py_ssize_t raw_off, PyObject *attrs_dict /* stolen or NULL */,
                   Py_ssize_t s, Py_ssize_t e, int self_closing) {
    if (st->has_pending && flush_text(st) < 0) {
        Py_XDECREF(attrs_dict);
        return -1;
    }
    const unsigned char *name = st->low + name_off;
    unsigned int closers = closer_mask(name, name_len);
    Stack *sk = &st->stack;
    if (closers) {
        while (sk->len > 1 && (sk->p[sk->len - 1].bits & closers)) {
            StackEnt *top = &sk->p[--sk->len];
            st->a.re[top->nid] = s;
            st->a.te[top->nid] = st->text_len;
        }
    }
    Py_ssize_t parent = sk->p[sk->len - 1].nid;
    Py_ssize_t nid = arena_alloc(&st->a, K_ELEM, parent, s, e, st->text_len);
    if (nid < 0) {
        Py_XDECREF(attrs_dict);
        return -1;
    }
    PyObject *tag =
        PyBytes_FromStringAndSize((const char *)name, name_len);
    if (!tag) {
        Py_XDECREF(attrs_dict);
        st->oom = 1;
        return -1;
    }
    st->a.tag[nid] = tag;
    /* tag_raw: original-case slice; reuse tag object when identical */
    if (memcmp(st->html + raw_off, name, (size_t)name_len) == 0) {
        Py_INCREF(tag);
        st->a.tag_raw[nid] = tag;
    } else {
        PyObject *raw = PyBytes_FromStringAndSize(
            (const char *)st->html + raw_off, name_len);
        if (!raw) {
            Py_XDECREF(attrs_dict);
            st->oom = 1;
            return -1;
        }
        st->a.tag_raw[nid] = raw;
    }
    st->a.attrs[nid] = attrs_dict; /* may be NULL */
    if (!self_closing && !is_void(name, name_len)) {
        if (stack_push(sk, nid, closee_bits(name, name_len),
                       (int32_t)name_off, (int32_t)name_len) < 0)
            return -1;
    }
    return 0;
}

/* raw-text / RCDATA content scan; returns resume pos */
static Py_ssize_t scan_raw_text(P *st, const unsigned char *name,
                                Py_ssize_t name_len, Py_ssize_t pos,
                                int rcdata) {
    unsigned char needle[16];
    needle[0] = '<';
    needle[1] = '/';
    memcpy(needle + 2, name, (size_t)name_len);
    size_t nl = (size_t)name_len + 2;
    Py_ssize_t n = st->n;
    Py_ssize_t search = pos;
    for (;;) {
        const unsigned char *hit = NULL;
        if (search < n)
            hit = (const unsigned char *)memmem(st->low + search,
                                                (size_t)(n - search), needle, nl);
        if (!hit) {
            if (emit_text(st, pos, n, rcdata) < 0) return -2;
            return n;
        }
        Py_ssize_t cand = (Py_ssize_t)(hit - st->low);
        Py_ssize_t after = cand + (Py_ssize_t)nl;
        if (after >= n || is_name_end(st->html[after])) {
            if (cand > pos && emit_text(st, pos, cand, rcdata) < 0) return -2;
            return cand;
        }
        search = cand + 1;
    }
}

/* _scan_open_tag; returns resume pos, -2 on error */
static Py_ssize_t scan_open_tag(P *st, Py_ssize_t lt) {
    const unsigned char *html = st->html;
    Py_ssize_t n = st->n;
    Py_ssize_t i = lt + 1;
    while (i < n && !is_name_end(html[i])) i++;
    Py_ssize_t name_off = lt + 1, name_len = i - (lt + 1);
    const unsigned char *name = st->low + name_off;
    /* fast path: `<name>` with no attributes */
    if (i < n && html[i] == '>') {
        if (on_open(st, name_off, name_len, lt + 1, NULL, lt, i + 1, 0) < 0)
            return -2;
        if (is_raw_text(name, name_len))
            return scan_raw_text(st, name, name_len, i + 1, 0);
        if (is_rcdata(name, name_len))
            return scan_raw_text(st, name, name_len, i + 1, 1);
        return i + 1;
    }
    PyObject *attrs = NULL; /* lazily created dict */
    int self_closing = 0;
    Py_ssize_t end = -1;
    for (;;) {
        while (i < n && is_ws(html[i])) i++;
        if (i >= n) {
            Py_XDECREF(attrs);
            return n; /* EOF in tag → drop */
        }
        unsigned char b = html[i];
        if (b == '>') {
            end = i + 1;
            break;
        }
        if (b == '/') {
            if (i + 1 < n && html[i + 1] == '>') {
                self_closing = 1;
                end = i + 2;
                break;
            }
            i++;
            continue;
        }
        if (b == '=') { /* junk byte: no attr name can start here */
            i++;
            continue;
        }
        /* attribute name */
        Py_ssize_t astart = i;
        while (i < n && !is_ws(html[i]) && html[i] != '=' && html[i] != '/' &&
               html[i] != '>')
            i++;
        Py_ssize_t aname_off = astart, aname_len = i - astart;
        /* optional value: ws* '=' ws* value */
        Py_ssize_t j = i;
        while (j < n && is_ws(html[j])) j++;
        PyObject *value = NULL; /* NULL → valueless; else bytes */
        int have_value = 0;
        if (j < n && html[j] == '=') {
            j++;
            while (j < n && is_ws(html[j])) j++;
            have_value = 1;
            if (j < n && (html[j] == '"' || html[j] == '\'')) {
                unsigned char q = html[j];
                Py_ssize_t vstart = j + 1;
                Py_ssize_t k = find_byte(html, vstart, n, q);
                if (k < 0) {
                    /* unterminated quoted value → drop whole tag */
                    Py_XDECREF(attrs);
                    return n;
                }
                value = decode_attr_value(st, vstart, k);
                i = k + 1;
            } else {
                Py_ssize_t vstart = j, k = j;
                while (k < n && !is_ws(html[k]) && html[k] != '>') k++;
                value = decode_attr_value(st, vstart, k);
                i = k;
            }
            if (!value) {
                Py_XDECREF(attrs);
                return -2;
            }
        }
        /* first-wins insert */
        {
            PyObject *key = PyBytes_FromStringAndSize(
                (const char *)st->low + aname_off, aname_len);
            if (!key) {
                Py_XDECREF(value);
                Py_XDECREF(attrs);
                st->oom = 1;
                return -2;
            }
            if (!attrs) {
                attrs = PyDict_New();
                if (!attrs) {
                    Py_DECREF(key);
                    Py_XDECREF(value);
                    st->oom = 1;
                    return -2;
                }
            }
            PyObject *v = have_value ? value : Py_None;
            if (PyDict_SetDefault(attrs, key, v) == NULL) {
                Py_DECREF(key);
                Py_XDECREF(value);
                Py_DECREF(attrs);
                st->oom = 1;
                return -2;
            }
            Py_DECREF(key);
            Py_XDECREF(value);
        }
    }
    if (on_open(st, name_off, name_len, lt + 1, attrs, lt, end, self_closing) <
        0)
        return -2;
    if (!self_closing) {
        if (is_raw_text(name, name_len))
            return scan_raw_text(st, name, name_len, end, 0);
        if (is_rcdata(name, name_len))
            return scan_raw_text(st, name, name_len, end, 1);
    }
    return end;
}

/* _scan_close_tag */
static Py_ssize_t scan_close_tag(P *st, Py_ssize_t lt) {
    const unsigned char *html = st->html;
    Py_ssize_t n = st->n;
    Py_ssize_t i = lt + 2;
    while (i < n && !is_name_end(html[i])) i++;
    Py_ssize_t gt = find_byte(html, i, n, '>');
    if (gt < 0) return n;
    if (on_close(st, lt + 2, i - (lt + 2), lt, gt + 1) < 0) return -2;
    return gt + 1;
}

/* _scan_markup_decl */
static Py_ssize_t scan_markup_decl(P *st, Py_ssize_t lt) {
    const unsigned char *html = st->html;
    const unsigned char *low = st->low;
    Py_ssize_t n = st->n;
    if (lt + 4 <= n && html[lt + 2] == '-' && html[lt + 3] == '-') {
        /* comment: find "-->" from lt+4 */
        Py_ssize_t close = -1;
        if (lt + 4 < n) {
            const unsigned char *hit = (const unsigned char *)memmem(
                html + lt + 4, (size_t)(n - (lt + 4)), "-->", 3);
            if (hit) close = (Py_ssize_t)(hit - html);
        }
        if (close < 0) {
            if (simple_node(st, K_COMMENT, lt + 4, n) < 0) return -2;
            return n;
        }
        if (simple_node(st, K_COMMENT, lt + 4, close) < 0) return -2;
        return close + 3;
    }
    if (lt + 9 <= n && memcmp(html + lt + 2, "[CDATA[", 7) == 0) {
        Py_ssize_t close = -1;
        if (lt + 9 < n) {
            const unsigned char *hit = (const unsigned char *)memmem(
                html + lt + 9, (size_t)(n - (lt + 9)), "]]>", 3);
            if (hit) close = (Py_ssize_t)(hit - html);
        }
        if (close < 0) {
            if (on_cdata(st, lt + 9, n) < 0) return -2;
            return n;
        }
        if (on_cdata(st, lt + 9, close) < 0) return -2;
        return close + 3;
    }
    {
        Py_ssize_t gt = find_byte(html, lt + 2, n, '>');
        Py_ssize_t end = gt < 0 ? n : gt;
        int is_doctype =
            lt + 9 <= n && memcmp(low + lt + 2, "doctype", 7) == 0;
        if (simple_node(st, is_doctype ? K_DOCTYPE : K_DECL, lt + 2, end) < 0)
            return -2;
        return gt < 0 ? n : gt + 1;
    }
}

/* _scan_pi */
static Py_ssize_t scan_pi(P *st, Py_ssize_t lt) {
    Py_ssize_t n = st->n;
    Py_ssize_t gt = find_byte(st->html, lt + 2, n, '>');
    if (gt < 0) {
        if (simple_node(st, K_PI, lt + 2, n) < 0) return -2;
        return n;
    }
    Py_ssize_t content_end = (st->html[gt - 1] == '?') ? gt - 1 : gt;
    if (simple_node(st, K_PI, lt + 2, content_end) < 0) return -2;
    return gt + 1;
}

static void arena_free(Arena *a) {
    for (Py_ssize_t i = 0; i < a->cnt; i++) {
        Py_XDECREF(a->tag[i]);
        Py_XDECREF(a->tag_raw[i]);
        Py_XDECREF(a->attrs[i]);
        Py_XDECREF(a->content[i]);
    }
    free(a->kind); free(a->parent); free(a->fc); free(a->lc); free(a->ns);
    free(a->ps); free(a->rs); free(a->re); free(a->ts); free(a->te);
    free(a->tag); free(a->tag_raw); free(a->attrs); free(a->content);
    memset(a, 0, sizeof(*a));
}

/* int64 column → new Python list */
static PyObject *int_col_to_list(const int64_t *col, Py_ssize_t cnt) {
    PyObject *lst = PyList_New(cnt);
    if (!lst) return NULL;
    for (Py_ssize_t i = 0; i < cnt; i++) {
        PyObject *v = PyLong_FromLongLong(col[i]);
        if (!v) {
            Py_DECREF(lst);
            return NULL;
        }
        PyList_SET_ITEM(lst, i, v);
    }
    return lst;
}

/* object column → new Python list (steals arena refs; NULL → None) */
static PyObject *obj_col_to_list(PyObject **col, Py_ssize_t cnt) {
    PyObject *lst = PyList_New(cnt);
    if (!lst) return NULL;
    for (Py_ssize_t i = 0; i < cnt; i++) {
        PyObject *v = col[i];
        if (v) {
            col[i] = NULL; /* stolen */
        } else {
            v = Py_None;
            Py_INCREF(v);
        }
        PyList_SET_ITEM(lst, i, v);
    }
    return lst;
}

static PyObject *native_parse(PyObject *self, PyObject *args) {
    PyObject *html_obj, *named;
    Py_ssize_t max_name_len;
    if (!PyArg_ParseTuple(args, "SO!n", &html_obj, &PyDict_Type, &named,
                          &max_name_len))
        return NULL;
    P st;
    memset(&st, 0, sizeof(st));
    st.html = (const unsigned char *)PyBytes_AS_STRING(html_obj);
    st.n = PyBytes_GET_SIZE(html_obj);
    st.named = named;
    st.max_name_len = max_name_len;

    unsigned char *low = (unsigned char *)malloc(st.n ? (size_t)st.n : 1);
    if (!low) return PyErr_NoMemory();
    for (Py_ssize_t i = 0; i < st.n; i++) low[i] = lower1(st.html[i]);
    st.low = low;

    /* root node (Document.__init__) */
    if (arena_grow(&st.a) < 0) goto oom;
    st.a.cnt = 1;
    st.a.kind[0] = K_DOC;
    st.a.tag[0] = NULL;
    st.a.tag_raw[0] = NULL;
    st.a.attrs[0] = NULL;
    st.a.content[0] = NULL;
    st.a.parent[0] = NID_NULL;
    st.a.fc[0] = NID_NULL;
    st.a.lc[0] = NID_NULL;
    st.a.ns[0] = NID_NULL;
    st.a.ps[0] = NID_NULL;
    st.a.rs[0] = 0;
    st.a.re[0] = st.n;
    st.a.ts[0] = 0;
    st.a.te[0] = 0;
    if (stack_push(&st.stack, 0, 0, 0, 0) < 0) goto oom;

    /* ---- main tokenize loop (tokenizer.tokenize) ------------------- */
    {
        Py_ssize_t pos = 0, n = st.n;
        const unsigned char *html = st.html;
        while (pos < n) {
            Py_ssize_t lt = find_byte(html, pos, n, '<');
            if (lt < 0) {
                if (emit_text(&st, pos, n, 1) < 0) goto err;
                pos = n;
                break;
            }
            if (lt > pos && emit_text(&st, pos, lt, 1) < 0) goto err;
            Py_ssize_t nxt = lt + 1;
            if (nxt >= n) {
                if (sink_text(&st, lt, n) < 0) goto err;
                pos = n;
                break;
            }
            unsigned char c = html[nxt];
            if (is_letter(c)) {
                pos = scan_open_tag(&st, lt);
            } else if (c == '/') {
                if (nxt + 1 < n && is_letter(html[nxt + 1])) {
                    pos = scan_close_tag(&st, lt);
                } else {
                    Py_ssize_t gt = find_byte(html, nxt, n, '>');
                    pos = gt < 0 ? n : gt + 1;
                }
            } else if (c == '!') {
                pos = scan_markup_decl(&st, lt);
            } else if (c == '?') {
                pos = scan_pi(&st, lt);
            } else {
                if (sink_text(&st, lt, nxt) < 0) goto err;
                pos = nxt;
            }
            if (pos == -2) goto err;
        }
        /* on_done */
        if (flush_text(&st) < 0) goto err;
        while (st.stack.len > 1) {
            StackEnt *top = &st.stack.p[--st.stack.len];
            st.a.re[top->nid] = n;
            st.a.te[top->nid] = st.text_len;
        }
        st.a.te[0] = st.text_len;
    }

    /* ---- export ----------------------------------------------------- */
    {
        PyObject *result = PyTuple_New(15);
        if (!result) goto oom;
        PyObject *cols[14];
        cols[0] = int_col_to_list(st.a.kind, st.a.cnt);
        cols[1] = obj_col_to_list(st.a.tag, st.a.cnt);
        cols[2] = obj_col_to_list(st.a.tag_raw, st.a.cnt);
        cols[3] = obj_col_to_list(st.a.attrs, st.a.cnt);
        cols[4] = obj_col_to_list(st.a.content, st.a.cnt);
        cols[5] = int_col_to_list(st.a.parent, st.a.cnt);
        cols[6] = int_col_to_list(st.a.fc, st.a.cnt);
        cols[7] = int_col_to_list(st.a.lc, st.a.cnt);
        cols[8] = int_col_to_list(st.a.ns, st.a.cnt);
        cols[9] = int_col_to_list(st.a.ps, st.a.cnt);
        cols[10] = int_col_to_list(st.a.rs, st.a.cnt);
        cols[11] = int_col_to_list(st.a.re, st.a.cnt);
        cols[12] = int_col_to_list(st.a.ts, st.a.cnt);
        cols[13] = int_col_to_list(st.a.te, st.a.cnt);
        int ok = 1;
        for (int i = 0; i < 14; i++)
            if (!cols[i]) ok = 0;
        if (!ok) {
            for (int i = 0; i < 14; i++) Py_XDECREF(cols[i]);
            Py_DECREF(result);
            goto oom;
        }
        for (int i = 0; i < 14; i++) PyTuple_SET_ITEM(result, i, cols[i]);
        PyObject *ttl = PyLong_FromLongLong(st.text_len);
        if (!ttl) {
            Py_DECREF(result);
            goto oom;
        }
        PyTuple_SET_ITEM(result, 14, ttl);
        arena_free(&st.a);
        free(st.stack.p);
        free(st.buf.p);
        free(low);
        return result;
    }

oom:
    if (!PyErr_Occurred()) PyErr_NoMemory();
err:
    if (!PyErr_Occurred()) PyErr_NoMemory();
    arena_free(&st.a);
    free(st.stack.p);
    free(st.buf.p);
    free(low);
    return NULL;
}

/* =====================================================================
 * Arena-consuming accelerators: X5 span export and X6 main_text.
 * These operate on the exported Python-list arena (built by EITHER the
 * C parse above or the pure-Python DOMBuilder), so they accelerate
 * extract.element_span_columns / extract.main_text transparently for
 * any Document. Semantics replicated 1:1; parity-gated by tests.
 * ===================================================================== */

static inline Py_ssize_t list_i(PyObject *lst, Py_ssize_t i) {
    return PyLong_AsSsize_t(PyList_GET_ITEM(lst, i));
}

/* element_span_columns (extract.py): append per-ELEM rows into the 7
 * caller-owned column lists; tag str decode memoized in `memo`. */
static PyObject *native_span_columns(PyObject *self, PyObject *args) {
    PyObject *kind, *tag, *parent, *rs, *re, *ts, *te, *cols, *memo;
    if (!PyArg_ParseTuple(args, "O!O!O!O!O!O!O!O!O!", &PyList_Type, &kind,
                          &PyList_Type, &tag, &PyList_Type, &parent,
                          &PyList_Type, &rs, &PyList_Type, &re, &PyList_Type,
                          &ts, &PyList_Type, &te, &PyTuple_Type, &cols,
                          &PyDict_Type, &memo))
        return NULL;
    if (PyTuple_GET_SIZE(cols) != 7) {
        PyErr_SetString(PyExc_ValueError, "cols must have 7 lists");
        return NULL;
    }
    PyObject *c_nid = PyTuple_GET_ITEM(cols, 0);
    PyObject *c_pid = PyTuple_GET_ITEM(cols, 1);
    PyObject *c_tag = PyTuple_GET_ITEM(cols, 2);
    PyObject *c_s = PyTuple_GET_ITEM(cols, 3);
    PyObject *c_e = PyTuple_GET_ITEM(cols, 4);
    PyObject *c_ts = PyTuple_GET_ITEM(cols, 5);
    PyObject *c_te = PyTuple_GET_ITEM(cols, 6);
    Py_ssize_t n = PyList_GET_SIZE(kind);
    Py_ssize_t count = 0;
    for (Py_ssize_t i = 1; i < n; i++) {
        if (list_i(kind, i) != K_ELEM) continue;
        PyObject *nid_obj = PyLong_FromSsize_t(i);
        if (!nid_obj) return NULL;
        int rc = PyList_Append(c_nid, nid_obj);
        Py_DECREF(nid_obj);
        if (rc < 0) return NULL;
        if (PyList_Append(c_pid, PyList_GET_ITEM(parent, i)) < 0) return NULL;
        {
            PyObject *t = PyList_GET_ITEM(tag, i);
            PyObject *s = PyDict_GetItem(memo, t); /* borrowed */
            if (!s) {
                s = PyUnicode_DecodeUTF8(PyBytes_AS_STRING(t),
                                         PyBytes_GET_SIZE(t), "replace");
                if (!s) return NULL;
                if (PyDict_GET_SIZE(memo) < 4096 &&
                    PyDict_SetItem(memo, t, s) < 0) {
                    Py_DECREF(s);
                    return NULL;
                }
                int rc2 = PyList_Append(c_tag, s);
                Py_DECREF(s);
                if (rc2 < 0) return NULL;
            } else if (PyList_Append(c_tag, s) < 0) {
                return NULL;
            }
        }
        if (PyList_Append(c_s, PyList_GET_ITEM(rs, i)) < 0) return NULL;
        if (PyList_Append(c_e, PyList_GET_ITEM(re, i)) < 0) return NULL;
        if (PyList_Append(c_ts, PyList_GET_ITEM(ts, i)) < 0) return NULL;
        if (PyList_Append(c_te, PyList_GET_ITEM(te, i)) < 0) return NULL;
        count++;
    }
    return PyLong_FromSsize_t(count);
}

/* ---- main_text (extract.py X6, rule set mcx-1) --------------------- */

/* STRIP_TAGS */
static int is_strip_tag(const unsigned char *p, Py_ssize_t len) {
    switch (len) {
    case 3:
        return tag_is(p, len, "nav") || tag_is(p, len, "svg");
    case 4:
        return tag_is(p, len, "form");
    case 5:
        return tag_is(p, len, "style") || tag_is(p, len, "aside");
    case 6:
        return tag_is(p, len, "script") || tag_is(p, len, "footer") ||
               tag_is(p, len, "header") || tag_is(p, len, "button") ||
               tag_is(p, len, "select") || tag_is(p, len, "option") ||
               tag_is(p, len, "iframe");
    case 8:
        return tag_is(p, len, "noscript") || tag_is(p, len, "template") ||
               tag_is(p, len, "optgroup");
    default:
        return 0;
    }
}

/* BLOCK_TAGS */
static int is_block_tag(const unsigned char *p, Py_ssize_t len) {
    switch (len) {
    case 1:
        return p[0] == 'p';
    case 2:
        if (p[0] == 'h' && p[1] >= '1' && p[1] <= '6') return 1;
        return tag_is(p, len, "dd") || tag_is(p, len, "dl") ||
               tag_is(p, len, "dt") || tag_is(p, len, "hr") ||
               tag_is(p, len, "li") || tag_is(p, len, "ol") ||
               tag_is(p, len, "td") || tag_is(p, len, "th") ||
               tag_is(p, len, "tr") || tag_is(p, len, "ul");
    case 3:
        return tag_is(p, len, "div") || tag_is(p, len, "nav") ||
               tag_is(p, len, "pre");
    case 4:
        return tag_is(p, len, "body") || tag_is(p, len, "form") ||
               tag_is(p, len, "html") || tag_is(p, len, "main") ||
               tag_is(p, len, "menu");
    case 5:
        return tag_is(p, len, "aside") || tag_is(p, len, "table") ||
               tag_is(p, len, "tbody") || tag_is(p, len, "tfoot") ||
               tag_is(p, len, "thead");
    case 6:
        return tag_is(p, len, "figure") || tag_is(p, len, "footer") ||
               tag_is(p, len, "header");
    case 7:
        return tag_is(p, len, "address") || tag_is(p, len, "article") ||
               tag_is(p, len, "caption") || tag_is(p, len, "details") ||
               tag_is(p, len, "section");
    case 8:
        return tag_is(p, len, "fieldset");
    case 10:
        return tag_is(p, len, "blockquote") || tag_is(p, len, "figcaption");
    default:
        return 0;
    }
}

/* bytes.split()-style whitespace for class words (b" \t\n\r\x0b\x0c") */
static inline int is_py_ws(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 0x0b ||
           c == 0x0c;
}

/* class-attribute word membership (selector _CLASS semantics) */
static int class_has_word(PyObject *attrs_entry, const char *word,
                          Py_ssize_t wlen) {
    static PyObject *class_key = NULL;
    if (!class_key) {
        class_key = PyBytes_FromString("class");
        if (!class_key) {
            PyErr_Clear();
            return 0;
        }
    }
    if (attrs_entry == Py_None) return 0;
    PyObject *v = PyDict_GetItem(attrs_entry, class_key); /* borrowed */
    if (!v || v == Py_None) return 0; /* valueless class → b"" → no words */
    const unsigned char *s = (const unsigned char *)PyBytes_AS_STRING(v);
    Py_ssize_t len = PyBytes_GET_SIZE(v);
    Py_ssize_t i = 0;
    while (i < len) {
        while (i < len && is_py_ws(s[i])) i++;
        Py_ssize_t start = i;
        while (i < len && !is_py_ws(s[i])) i++;
        if (i - start == wlen && memcmp(s + start, word, (size_t)wlen) == 0)
            return 1;
    }
    return 0;
}

/* attr equality (doc.attr: missing → no match; valueless → b"") */
static int attr_equals(PyObject *attrs_entry, PyObject *key,
                       const char *val, Py_ssize_t vlen) {
    if (attrs_entry == Py_None) return 0;
    PyObject *v = PyDict_GetItem(attrs_entry, key);
    if (!v) return 0;
    if (v == Py_None) return vlen == 0;
    return PyBytes_GET_SIZE(v) == vlen &&
           memcmp(PyBytes_AS_STRING(v), val, (size_t)vlen) == 0;
}

typedef struct {
    PyObject *kind, *tag, *attrs, *content, *parent, *fc, *lc, *ns, *ps;
    Py_ssize_t n;
} ADoc;

/* pre-order first match for one container test; -1 if none.
 * test: 0 tag-eq, 1 attr-eq, 2 class-word */
static Py_ssize_t find_first(ADoc *d, int test, PyObject *attr_key,
                             const char *val, Py_ssize_t vlen) {
    Py_ssize_t c = list_i(d->fc, 0);
    while (c != NID_NULL) {
        if (list_i(d->kind, c) == K_ELEM) {
            int hit = 0;
            if (test == 0) {
                PyObject *t = PyList_GET_ITEM(d->tag, c);
                hit = PyBytes_GET_SIZE(t) == vlen &&
                      memcmp(PyBytes_AS_STRING(t), val, (size_t)vlen) == 0;
            } else if (test == 1) {
                hit = attr_equals(PyList_GET_ITEM(d->attrs, c), attr_key, val,
                                  vlen);
            } else {
                hit = class_has_word(PyList_GET_ITEM(d->attrs, c), val, vlen);
            }
            if (hit) return c;
        }
        /* descendants() iteration */
        Py_ssize_t f = list_i(d->fc, c);
        if (f != NID_NULL) {
            c = f;
            continue;
        }
        while (c != 0 && list_i(d->ns, c) == NID_NULL)
            c = list_i(d->parent, c);
        if (c == 0) return NID_NULL;
        c = list_i(d->ns, c);
    }
    return NID_NULL;
}

/* _find_container: priority selector ladder (extract.py mcx-1) */
static Py_ssize_t find_container(ADoc *d) {
    static PyObject *k_role = NULL, *k_id = NULL;
    if (!k_role) {
        k_role = PyBytes_FromString("role");
        k_id = PyBytes_FromString("id");
        if (!k_role || !k_id) return 0;
    }
    Py_ssize_t hit;
    if ((hit = find_first(d, 0, NULL, "main", 4)) != NID_NULL) return hit;
    if ((hit = find_first(d, 0, NULL, "article", 7)) != NID_NULL) return hit;
    if ((hit = find_first(d, 1, k_role, "main", 4)) != NID_NULL) return hit;
    if ((hit = find_first(d, 1, k_id, "main", 4)) != NID_NULL) return hit;
    if ((hit = find_first(d, 1, k_id, "content", 7)) != NID_NULL) return hit;
    if ((hit = find_first(d, 2, NULL, "main-content", 12)) != NID_NULL)
        return hit;
    if ((hit = find_first(d, 2, NULL, "post-content", 12)) != NID_NULL)
        return hit;
    if ((hit = find_first(d, 2, NULL, "article-body", 12)) != NID_NULL)
        return hit;
    if ((hit = find_first(d, 2, NULL, "content", 7)) != NID_NULL) return hit;
    if ((hit = find_first(d, 0, NULL, "body", 4)) != NID_NULL) return hit;
    return 0;
}

/* _collapse + strip appended into the blocks buffer (with '\n' separator
 * before when blocks already present). Returns 0/-1; *appended says
 * whether a non-empty block was written. */
static int collapse_into(Buf *blocks, const unsigned char *s, size_t len,
                         int *appended) {
    /* collapse into a scratch on the stack when small, else malloc */
    unsigned char small[512];
    unsigned char *tmp = len <= sizeof(small)
                             ? small
                             : (unsigned char *)malloc(len ? len : 1);
    if (!tmp) return -1;
    size_t o = 0, i = 0;
    while (i < len) {
        unsigned char c = s[i];
        int ws1 = (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f');
        int nbsp = (c == 0xC2 && i + 1 < len && s[i + 1] == 0xA0);
        if (ws1 || nbsp) {
            /* run of (ws1 | nbsp) → single space */
            while (i < len) {
                c = s[i];
                if (c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
                    c == '\f') {
                    i++;
                } else if (c == 0xC2 && i + 1 < len && s[i + 1] == 0xA0) {
                    i += 2;
                } else {
                    break;
                }
            }
            tmp[o++] = ' ';
        } else {
            tmp[o++] = c;
            i++;
        }
    }
    /* strip(): ASCII whitespace incl. \x0b */
    size_t a = 0, b = o;
    while (a < b && (tmp[a] == ' ' || tmp[a] == '\t' || tmp[a] == '\n' ||
                     tmp[a] == '\r' || tmp[a] == 0x0b || tmp[a] == 0x0c))
        a++;
    while (b > a && (tmp[b - 1] == ' ' || tmp[b - 1] == '\t' ||
                     tmp[b - 1] == '\n' || tmp[b - 1] == '\r' ||
                     tmp[b - 1] == 0x0b || tmp[b - 1] == 0x0c))
        b--;
    int rc = 0;
    if (b > a) {
        if (*appended) rc = buf_put(blocks, (const unsigned char *)"\n", 1);
        if (rc == 0) rc = buf_put(blocks, tmp + a, b - a);
        *appended = 1;
    }
    if (tmp != small) free(tmp);
    return rc;
}

typedef struct {
    Py_ssize_t nid;
    int leaving;
} WalkEv;

/* main_text_node walk (extract.py) from `root`; returns bytes or NULL */
static PyObject *walk_main_text(ADoc *d, Py_ssize_t root) {
    Buf blocks = {0};
    Buf cur = {0}; /* current block bytes */
    int has_pieces = 0;
    int appended = 0;
    WalkEv *ev = NULL;
    Py_ssize_t elen = 0, ecap = 0;
#define PUSH(NID, LV)                                                      \
    do {                                                                   \
        if (elen >= ecap) {                                                \
            Py_ssize_t nc = ecap ? ecap * 2 : 64;                          \
            WalkEv *t2 = (WalkEv *)realloc(ev, (size_t)nc * sizeof(WalkEv)); \
            if (!t2) goto fail;                                            \
            ev = t2;                                                       \
            ecap = nc;                                                     \
        }                                                                  \
        ev[elen].nid = (NID);                                              \
        ev[elen].leaving = (LV);                                           \
        elen++;                                                            \
    } while (0)
#define FLUSH()                                                            \
    do {                                                                   \
        if (has_pieces) {                                                  \
            if (collapse_into(&blocks, cur.p, cur.len, &appended) < 0)     \
                goto fail;                                                 \
            cur.len = 0;                                                   \
            has_pieces = 0;                                                \
        }                                                                  \
    } while (0)
    PUSH(root, 0);
    while (elen) {
        elen--;
        Py_ssize_t nid = ev[elen].nid;
        int leaving = ev[elen].leaving;
        if (leaving) {
            FLUSH();
            continue;
        }
        Py_ssize_t k = list_i(d->kind, nid);
        if (k == K_ELEM) {
            PyObject *t = PyList_GET_ITEM(d->tag, nid);
            const unsigned char *tp = (const unsigned char *)PyBytes_AS_STRING(t);
            Py_ssize_t tl = PyBytes_GET_SIZE(t);
            if (is_strip_tag(tp, tl)) continue;
            if (tl == 2 && tp[0] == 'b' && tp[1] == 'r') {
                FLUSH();
                continue;
            }
            if (is_block_tag(tp, tl)) {
                FLUSH();
                PUSH(nid, 1);
            }
            {
                Py_ssize_t c = list_i(d->lc, nid);
                while (c != NID_NULL) {
                    PUSH(c, 0);
                    c = list_i(d->ps, c);
                }
            }
        } else if (k == K_TEXT || k == K_CDATA) {
            PyObject *co = PyList_GET_ITEM(d->content, nid);
            if (co != Py_None) {
                if (buf_put(&cur, (const unsigned char *)PyBytes_AS_STRING(co),
                            (size_t)PyBytes_GET_SIZE(co)) < 0)
                    goto fail;
            }
            has_pieces = 1;
        } else if (k == K_DOC) {
            Py_ssize_t c = list_i(d->lc, nid);
            while (c != NID_NULL) {
                PUSH(c, 0);
                c = list_i(d->ps, c);
            }
        }
    }
    FLUSH();
#undef PUSH
#undef FLUSH
    {
        PyObject *r = PyBytes_FromStringAndSize((const char *)blocks.p,
                                                (Py_ssize_t)blocks.len);
        free(blocks.p);
        free(cur.p);
        free(ev);
        return r;
    }
fail:
    free(blocks.p);
    free(cur.p);
    free(ev);
    if (!PyErr_Occurred()) PyErr_NoMemory();
    return NULL;
}

/* main_text(kind, tag, attrs, content, parent, fc, lc, ns, ps[, root]) */
static PyObject *native_main_text(PyObject *self, PyObject *args) {
    ADoc d;
    Py_ssize_t root = -1;
    if (!PyArg_ParseTuple(args, "O!O!O!O!O!O!O!O!O!|n", &PyList_Type, &d.kind,
                          &PyList_Type, &d.tag, &PyList_Type, &d.attrs,
                          &PyList_Type, &d.content, &PyList_Type, &d.parent,
                          &PyList_Type, &d.fc, &PyList_Type, &d.lc,
                          &PyList_Type, &d.ns, &PyList_Type, &d.ps, &root))
        return NULL;
    d.n = PyList_GET_SIZE(d.kind);
    if (root < 0) root = find_container(&d);
    if (PyErr_Occurred()) return NULL;
    return walk_main_text(&d, root);
}

static PyMethodDef methods[] = {
    {"parse", native_parse, METH_VARARGS,
     "parse(html, named_entities, max_name_len) -> 14 arena columns + "
     "total_text_len"},
    {"span_columns", native_span_columns, METH_VARARGS,
     "span_columns(kind, tag, parent, rs, re, ts, te, cols, memo) -> n"},
    {"main_text", native_main_text, METH_VARARGS,
     "main_text(kind, tag, attrs, content, parent, fc, lc, ns, ps[, root])"
     " -> bytes"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_htmld_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__htmld_native(void) {
    return PyModule_Create(&moduledef);
}
