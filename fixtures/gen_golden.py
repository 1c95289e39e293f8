"""Golden-oracle generator for the xxhash64 query family (VERDICT r01 #2).

``dedup_minhash_lsh`` / ``dedup_simhash`` / ``doc_winnow_fingerprint`` /
``embed_ann_lsh`` use Spark's ``xxhash64`` (or numpy hyperplanes), which
DuckDB cannot express — round 1 left them ``no_oracle``. This module
recomputes each query's expected output in plain Python (scalar loops, no
Spark, no htmld_spark imports) using the pure-Python XXH64 in
``fixtures/xxh64.py``, and writes golden parquet that ``oracle_sql()``
reads via ``read_parquet``. The DuckDB side then checks rows+schema+hash
against a genuinely independent implementation of the same public
algorithms (MinHash banding, SimHash block trick, winnowing
[Schleimer/Wilkerson/Aiken SIGMOD'03], random-hyperplane LSH).

Semantics replicated exactly (pinned by tests/test_golden_oracles.py):
- Spark ``F.trim`` strips ' ' only; ``F.split(_, '\\s+')`` is Java regex
  split with limit -1 (Java \\s = [ \\t\\n\\x0B\\f\\r]; keeps leading
  empty token);
- ``F.round(x, d)`` is BigDecimal HALF_UP on the double's exact binary
  expansion → ``decimal.Decimal(x).quantize(..., ROUND_HALF_UP)``;
- bigint min/sort/comparison is SIGNED; concat_ws renders Long.toString.
"""

from __future__ import annotations

import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.xxh64 import Long, spark_xxhash64  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
GOLDEN_VERSION = "18"  # bump to invalidate cached golden parquet

# Java \s (no UNICODE flag) — NOT Python \s, which is unicode-aware on str.
_JAVA_WS = r"[ \t\n\x0B\f\r]+"


def _java_split_ws(s: str) -> list[str]:
    """Java ``String.split("\\s+", -1)``: Python re.split matches (keeps
    leading/trailing empty tokens; \\s+ cannot match empty)."""
    return re.split(_JAVA_WS, s)


def _spark_trim(s: str) -> str:
    return s.strip(" ")


def _round_half_up(x: float, digits: int) -> float:
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


# ------------------------------------------------------------------ documents family


def _tokens(text: str) -> list[str]:
    return _java_split_ws(_spark_trim(text))


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = _tokens(text)
    k = len(toks) - (n - 1)
    if k >= 1:
        return [" ".join(toks[i : i + n]) for i in range(k)]
    return [_spark_trim(text)]


def golden_minhash_lsh(
    docs: list[tuple[int, str]],
    num_perms: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> list[tuple[int, int, float]]:
    """Replicates functions/dedup.minhash_lsh_pairs: explode→min MinHash
    signatures, banding equi-join candidates, exact shingle-set Jaccard."""
    rows_per_band = num_perms // bands
    sigs: dict[int, list[int]] = {}
    sets: dict[int, frozenset[str]] = {}
    for doc_id, text in docs:
        sh = _shingles(text)
        sigs[doc_id] = [
            min(spark_xxhash64(s, i) for s in sh) for i in range(num_perms)
        ]
        sets[doc_id] = frozenset(sh)
    # banding: bucket docs by (band, band_key)
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            cols = sig[b * rows_per_band : (b + 1) * rows_per_band]
            key = spark_xxhash64(*[Long(c) for c in cols], b)
            buckets.setdefault((b, key), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b2 in ids[i + 1 :]:
                if a != b2:
                    cand.add((a, b2))
    out = []
    for a, b2 in sorted(cand):
        inter = len(sets[a] & sets[b2])
        union = len(sets[a] | sets[b2])
        j = _round_half_up(inter / union, 4)
        if j >= jaccard_threshold:
            out.append((a, b2, j))
    return out


def golden_incremental_dedup(
    new_docs: list[tuple[int, str]],
    ref_docs: list[tuple[int, str]],
    num_perms: int = 16,
    bands: int = 4,
) -> list[int]:
    """Replicates functions/dedup.dedup_against_reference (near=True):
    drop new docs whose md5 matches the reference, then drop new docs
    sharing ≥1 MinHash band key with any reference doc."""
    import hashlib

    ref_md5 = {
        hashlib.md5((t or "").encode("utf-8")).hexdigest() for _, t in ref_docs
    }
    surv = [
        (d, t)
        for d, t in new_docs
        if hashlib.md5((t or "").encode("utf-8")).hexdigest() not in ref_md5
    ]
    rows_per_band = num_perms // bands

    def band_keys(text):
        sh = _shingles(text)
        sig = [min(spark_xxhash64(s, i) for s in sh) for i in range(num_perms)]
        return {
            (
                b,
                spark_xxhash64(
                    *[Long(c) for c in sig[b * rows_per_band : (b + 1) * rows_per_band]],
                    b,
                ),
            )
            for b in range(bands)
        }

    ref_keys = set()
    for _, t in ref_docs:
        ref_keys |= band_keys(t)
    return sorted(d for d, t in surv if not (band_keys(t) & ref_keys))


def golden_simhash_pairs(
    docs: list[tuple[int, str]], max_hamming: int = 3, n_blocks: int = 4
) -> list[tuple[int, int, int]]:
    """Replicates functions/dedup.simhash_near_pairs (block trick)."""
    sims_u: dict[int, int] = {}
    for doc_id, text in docs:
        votes = [0] * 64
        for tok in _tokens(text):
            h = spark_xxhash64(tok)  # signed; arithmetic shift matches Java
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        u = 0
        for i in range(64):
            if votes[i] > 0:
                u |= 1 << i
        sims_u[doc_id] = u
    width = 64 // n_blocks
    mask = (1 << width) - 1
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, u in sims_u.items():
        for c in range(n_blocks):
            buckets.setdefault((c, (u >> (c * width)) & mask), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cand.add((a, b))
    out = []
    for a, b in sorted(cand):
        ham = bin(sims_u[a] ^ sims_u[b]).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out


def golden_winnow(
    docs: list[tuple[int, str]], k: int = 8, w: int = 4
) -> list[tuple[int, int, int, int]]:
    """Replicates functions/text.winnow_fingerprint (array-expression
    version incl. the short-doc fallbacks)."""
    out = []
    for doc_id, text in docs:
        norm = re.sub(_JAVA_WS, " ", text.lower())
        n_grams = max(len(norm) - (k - 1), 0)
        if n_grams > 0:
            gh = [spark_xxhash64(norm[i : i + k]) for i in range(n_grams)]
        else:
            gh = [spark_xxhash64(norm)]
        n_windows = n_grams - (w - 1)
        if n_windows >= 1:
            mins = [min(gh[i : i + w]) for i in range(n_windows)]
        else:
            mins = [min(gh)]
        selected = sorted(set(mins))
        fp = spark_xxhash64(",".join(str(v) for v in selected))
        out.append((doc_id, n_grams, len(selected), fp))
    return out


def golden_near_dedup_keep(
    doc_ids: list[int], pairs: list[tuple[int, int, float]]
) -> list[int]:
    """Replicates dedup.near_dedup_keep: union-find over the pair graph,
    keep min id per component + all unpaired docs."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    paired = set()
    for a, b, _ in pairs:
        union(a, b)
        paired.add(a)
        paired.add(b)
    keep = sorted(
        {find(d) for d in paired} | {d for d in doc_ids if d not in paired}
    )
    return keep


def golden_hash_split(
    doc_ids: list[int], train_pct: int = 90, val_pct: int = 5
) -> list[tuple[int, str]]:
    """Replicates functions/text.hash_split over a bigint key:
    pmod(xxhash64(id), 100) → train/val/test percentage buckets."""
    out = []
    for d in doc_ids:
        h = spark_xxhash64(Long(d))
        b = ((h % 100) + 100) % 100
        split = "train" if b < train_pct else ("val" if b < train_pct + val_pct else "test")
        out.append((d, split))
    return out


def golden_stratified_sample(
    rows: list[tuple[int, str]],
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> list[tuple[int, str]]:
    """Replicates functions/text.stratified_sample over (doc_id, lang):
    keep iff pmod(xxhash64(id, '_strat_'), 1e6) < rate(lang)·1e6 —
    chained-seed hash replayed by the pure-Python replica."""
    out = []
    for d, lang in rows:
        h = spark_xxhash64(Long(d), "_strat_")
        b = ((h % 1_000_000) + 1_000_000) % 1_000_000
        r = rates.get(lang, default_rate)
        if b < int(r * 1_000_000):
            out.append((d, lang))
    return out


def golden_epoch_shuffle(
    doc_ids: list[int], seed: int = 7, n_shards: int = 16
) -> list[tuple[int, int, int]]:
    """Replicates functions/text.epoch_shuffle: shard =
    pmod(xxhash64(id, seed), n_shards); pos = 1-based rank within the
    shard ordered by (xxhash64(id, seed, '_pos_'), id) — signed-bigint
    comparison, chained-seed hashes replayed by the pure-Python
    replica. Returns (doc_id, shard, pos)."""
    rows = []
    for d in doc_ids:
        # F.lit(seed) is an IntegerType literal → the replica hashes it
        # as a bare int (4-byte lane), NOT Long (the Int-vs-Long hash
        # distinction the band-key replicas already pin)
        h = spark_xxhash64(Long(d), seed)
        shard = ((h % n_shards) + n_shards) % n_shards
        order = spark_xxhash64(Long(d), seed, "_pos_")
        rows.append((d, shard, order))
    out = []
    by_shard: dict[int, list] = {}
    for d, shard, order in rows:
        by_shard.setdefault(shard, []).append((order, d))
    for shard, members in by_shard.items():
        members.sort()
        out.extend((d, shard, pos + 1) for pos, (_o, d) in enumerate(members))
    out.sort()
    return out


def golden_temperature_sample(
    rows: list[tuple[int, str]],
    alpha: float = 0.3,
    sample_frac: float = 0.5,
) -> list[tuple[int, str]]:
    """Replicates functions/text.temperature_sample over (doc_id, lang):
    per-language rates min(1, S·q_l/n_l) with q_l ∝ (n_l/N)^α computed
    in sorted-language order (bit-identical float sequence to the Spark
    driver's temperature_rates), then the same xxh64 keep-hash as
    golden_stratified_sample. NULL strata mirror the Spark side's
    collect-side filter (text.temperature_sample drops None langs from
    the count collect → default_rate=0.0 drops the rows): skip them here
    too, or a None key would crash the sorted() rate derivation."""
    counts: dict[str, int] = {}
    for _, lang in rows:
        if lang is None:  # mirror temperature_sample's None-strata drop
            continue
        counts[lang] = counts.get(lang, 0) + 1
    total = sum(counts.values())
    qs = {l: (counts[l] / total) ** alpha for l in sorted(counts)}
    z = sum(qs[l] for l in sorted(qs))
    target = sample_frac * total
    rates = {l: min(1.0, target * (qs[l] / z) / counts[l]) for l in sorted(qs)}
    return golden_stratified_sample(rows, rates, default_rate=0.0)


# token-budget mixing contract: budgets over the documents fixture's
# source strata — src1 clamps to rate 1.0, src0/src3 land mid-rates,
# src2 a small rate, every other source is unbudgeted → dropped.
# Shared with __spark_entry__._q_token_budget_sample (same dict object).
TOKEN_BUDGET_CONTRACT: dict[str, float] = {
    "src0": 3000, "src1": 999_999, "src2": 500, "src3": 7000,
}


def golden_token_budget_sample(
    rows: list[tuple[int, str, int]],
    budgets: dict[str, float],
) -> list[tuple[int, str]]:
    """Replicates functions/text.token_budget_sample over (doc_id,
    source, n_tokens): per-stratum rate min(1, budget/token_sum) in
    sorted-stratum order (one division — bit-identical to the Spark
    driver's token_budget_rates), then the same xxh64 keep-hash as
    golden_stratified_sample. NULL strata/token counts mirror the Spark
    side's collect-side drop."""
    sums: dict[str, int] = {}
    for _d, s, t in rows:
        if s is None or t is None:
            continue
        sums[s] = sums.get(s, 0) + int(t)
    rates = {
        s: min(1.0, float(budgets[s]) / sums[s])
        for s in sorted(sums)
        if s in budgets and sums[s] > 0
    }
    return golden_stratified_sample(
        [(d, s) for d, s, _t in rows], rates, default_rate=0.0
    )


# ------------------------------------------------------------------ embeddings family


def golden_ann_lsh(
    vec_ids: list[int],
    embeddings: list[list[float]],
    query_vec_id: int = 0,
    k: int = 20,
    dim: int = 64,
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> list[tuple[int, float]]:
    """Replicates functions/similarity.ann_lsh_topk: RandomState(seed)
    hyperplane buckets (float32 vecs @ float64 planes), Hamming probe,
    exact left-to-right float64 cosine fold, round 6 HALF_UP, order by
    (cosine desc, id)."""
    import numpy as np

    planes = np.random.RandomState(seed).randn(n_planes, dim)
    m = np.stack([np.asarray(v, dtype=np.float32) for v in embeddings])
    bits = (m @ planes.T) > 0
    buckets = np.zeros(len(vec_ids), dtype=np.int64)
    for i in range(n_planes):
        buckets |= bits[:, i].astype(np.int64) << i
    by_id = {vid: idx for idx, vid in enumerate(vec_ids)}
    qi = by_id[query_vec_id]
    qb = int(buckets[qi])
    qv = [float(np.float64(np.float32(x))) for x in embeddings[qi]]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        import math

        return math.sqrt(acc)

    qn = fold_norm(qv)
    scored = []
    for idx, vid in enumerate(vec_ids):
        if vid == query_vec_id:
            continue
        if bin(int(buckets[idx]) ^ qb).count("1") > probe_hamming:
            continue
        v = [float(np.float64(np.float32(x))) for x in embeddings[idx]]
        cos = fold_dot(v, qv) / (fold_norm(v) * qn)
        scored.append((vid, _round_half_up(cos, 6)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def golden_ann_ivf(
    vec_ids: list[int],
    embeddings: list[list[float]],
    query_vec_id: int = 0,
    k: int = 20,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    n_iter: int = 20,
    sample_mod: int = 1,
    sample_limit: int = 100_000,
) -> list[tuple[int, float]]:
    """Replays similarity.ivf_build_sampled + ann_ivf_query per the pinned
    Lloyd's spec (hash-threshold sample ``pmod(xxhash64(id), sample_mod)
    == 0`` sorted by id and capped — VERDICT r02 #3's unbiased rule —
    seeded init, per-row ``((cents - v)**2).sum(axis=1)`` assignment,
    np.mean updates, empty cells frozen, centroids rounded 6dp,
    stable-argsort probe)."""
    import math

    import numpy as np

    sampled = [
        i
        for i in range(len(vec_ids))
        if ((spark_xxhash64(Long(vec_ids[i])) % sample_mod) + sample_mod)
        % sample_mod
        == 0
    ]
    order = sorted(sampled, key=lambda i: vec_ids[i])[:sample_limit]
    X = np.stack(
        [np.asarray(embeddings[i], dtype=np.float64) for i in order]
    )
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(X), size=n_cells, replace=False)
    cents = X[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.array(
            [int(np.argmin(((cents - v) ** 2).sum(axis=1))) for v in X]
        )
        new = cents.copy()
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        if np.array_equal(new, cents):
            break
        cents = new
    cents = np.round(cents, 6)

    cell_of = {}
    for i, vid in enumerate(vec_ids):
        v = np.asarray(embeddings[i], dtype=np.float64)
        cell_of[vid] = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
    by_id = {vid: i for i, vid in enumerate(vec_ids)}
    q64 = np.asarray(embeddings[by_id[query_vec_id]], dtype=np.float64)
    d = ((cents - q64) ** 2).sum(axis=1)
    probe = {int(i) for i in np.argsort(d, kind="stable")[:n_probe]}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return math.sqrt(acc)

    qv = [float(np.float64(np.float32(x))) for x in embeddings[by_id[query_vec_id]]]
    qn = fold_norm(qv)
    scored = []
    for i, vid in enumerate(vec_ids):
        if vid == query_vec_id or cell_of[vid] not in probe:
            continue
        v = [float(np.float64(np.float32(x))) for x in embeddings[i]]
        cos = fold_dot(v, qv) / (fold_norm(v) * qn)
        scored.append((vid, _round_half_up(cos, 6)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


def golden_semdedup(
    vec_ids: list[int],
    embeddings: list[list[float]],
    n_cells: int = 16,
    tau: float = 0.3,
    seed: int = 42,
    n_iter: int = 20,
    sample_mod: int = 2,
    sample_limit: int = 100_000,
    max_cell_size: int | None = None,
) -> list[tuple[int, int]]:
    """Replays similarity.semdedup_keep: the pinned Lloyd fit over the
    hash-threshold sample (identical spec to golden_ann_ivf), full-table
    assignment, then the keep-lowest-id one-shot rule — vec j dropped
    iff ANY i < j in its cluster has half-up-round(cos, 6) ≥ tau, cosine
    via the float32-cast left-fold (Spark's array<float> → double cast +
    aggregate fold order). ``max_cell_size`` replays the hot-cluster cap
    (VERDICT r06 #6, the L27 max_bucket_size rule): cells larger than
    the cap skip the within-cell pairwise pass entirely — every member
    kept. Returns kept (vec_id, cell) sorted by id."""
    import math

    import numpy as np

    sampled = [
        i
        for i in range(len(vec_ids))
        if ((spark_xxhash64(Long(vec_ids[i])) % sample_mod) + sample_mod)
        % sample_mod
        == 0
    ]
    order = sorted(sampled, key=lambda i: vec_ids[i])[:sample_limit]
    X = np.stack([np.asarray(embeddings[i], dtype=np.float64) for i in order])
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(X), size=n_cells, replace=False)
    cents = X[np.sort(idx)].copy()
    for _ in range(n_iter):
        assign = np.array(
            [int(np.argmin(((cents - v) ** 2).sum(axis=1))) for v in X]
        )
        new = cents.copy()
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        if np.array_equal(new, cents):
            break
        cents = new
    cents = np.round(cents, 6)

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return math.sqrt(acc)

    by_cell: dict[int, list[int]] = {}
    for i, vid in enumerate(vec_ids):
        v = np.asarray(embeddings[i], dtype=np.float64)
        c = int(np.argmin(((cents - v) ** 2).sum(axis=1)))
        by_cell.setdefault(c, []).append(i)
    idx_of = {vid: i for i, vid in enumerate(vec_ids)}
    dropped: set[int] = set()
    kept: list[tuple[int, int]] = []
    for c, members in by_cell.items():
        if max_cell_size is not None and len(members) > max_cell_size:
            kept.extend((vec_ids[i], c) for i in members)  # hot cell: all kept
            continue
        ms = sorted(members, key=lambda i: vec_ids[i])
        casted = {
            i: [float(np.float64(np.float32(x))) for x in embeddings[i]]
            for i in ms
        }
        norms = {i: fold_norm(casted[i]) for i in ms}
        for jpos, j in enumerate(ms):
            for i in ms[:jpos]:
                cos = fold_dot(casted[i], casted[j]) / (norms[i] * norms[j])
                if _round_half_up(cos, 6) >= tau:
                    dropped.add(vec_ids[j])
                    break
        kept.extend(
            (vec_ids[i], c) for i in ms if vec_ids[i] not in dropped
        )
    kept.sort()
    return kept


def golden_lsh_near_pairs(
    vec_ids: list[int],
    embeddings: list[list[float]],
    dim: int = 64,
    cosine_threshold: float = 0.3,
    bands: int = 8,
    rows_per_band: int = 16,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> list[tuple[int, int, float]]:
    """Replicates functions/similarity.lsh_near_pairs (banded form,
    VERDICT r02 #1; defaults 8×16 per VERDICT r03 #1): per-band hyperplane
    keys (planes [b*r,(b+1)*r) of one RandomState(seed) matrix),
    candidates = same (band, band_key) pairs union'd over bands —
    skipping buckets larger than ``max_bucket_size`` when set — exact
    left-to-right float64 cosine ≥ threshold."""
    import math

    import numpy as np

    planes = np.random.RandomState(seed).randn(bands * rows_per_band, dim)
    m = np.stack([np.asarray(v, dtype=np.float32) for v in embeddings])
    bits = (m @ planes.T) > 0

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def fold_norm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return math.sqrt(acc)

    cand: set[tuple[int, int]] = set()
    for b in range(bands):
        keys = np.zeros(len(vec_ids), dtype=np.int64)
        for r in range(rows_per_band):
            keys |= bits[:, b * rows_per_band + r].astype(np.int64) << r
        by_key: dict[int, list[int]] = {}
        for idx, vid in enumerate(vec_ids):
            by_key.setdefault(int(keys[idx]), []).append(idx)
        for idxs in by_key.values():
            if max_bucket_size is not None and len(idxs) > max_bucket_size:
                continue
            idxs = sorted(idxs, key=lambda i: vec_ids[i])
            for i, ia in enumerate(idxs):
                for ib in idxs[i + 1 :]:
                    cand.add((ia, ib))
    vecs64 = [
        [float(np.float64(np.float32(x))) for x in v] for v in embeddings
    ]
    norms = [fold_norm(v) for v in vecs64]
    out = []
    for ia, ib in cand:
        cos = fold_dot(vecs64[ia], vecs64[ib]) / (norms[ia] * norms[ib])
        cos = _round_half_up(cos, 6)
        if cos >= cosine_threshold:
            pa_, pb_ = sorted((vec_ids[ia], vec_ids[ib]))
            out.append((pa_, pb_, cos))
    out.sort()
    return out


# ------------------------------------------------------------------ ensure/write


def golden_dir(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(DATA_DIR, "golden", tag)


def ensure_golden(sf_dir: str) -> str:
    """Compute + cache golden parquet for the xxhash64 family over the
    driver tables in ``sf_dir``. Returns the golden directory."""
    out_dir = golden_dir(sf_dir)
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == GOLDEN_VERSION:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    dt = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    docs = list(zip(dt.column("doc_id").to_pylist(), dt.column("text").to_pylist()))

    mh = golden_minhash_lsh(docs)
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in mh], pa.int64()),
                "id_b": pa.array([r[1] for r in mh], pa.int64()),
                "jaccard": pa.array([r[2] for r in mh], pa.float64()),
            }
        ),
        os.path.join(out_dir, "minhash_lsh_pairs.parquet"),
    )

    sh = golden_simhash_pairs(docs)
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in sh], pa.int64()),
                "id_b": pa.array([r[1] for r in sh], pa.int64()),
                "hamming": pa.array([r[2] for r in sh], pa.int32()),
            }
        ),
        os.path.join(out_dir, "simhash_pairs.parquet"),
    )

    wn = golden_winnow(docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in wn], pa.int64()),
                "n_grams": pa.array([r[1] for r in wn], pa.int32()),
                "n_selected": pa.array([r[2] for r in wn], pa.int32()),
                "winnow_fp": pa.array([r[3] for r in wn], pa.int64()),
            }
        ),
        os.path.join(out_dir, "winnow_fingerprint.parquet"),
    )

    et = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ann = golden_ann_lsh(
        et.column("vec_id").to_pylist(), et.column("embedding").to_pylist()
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in ann], pa.int64()),
                "cosine": pa.array([r[1] for r in ann], pa.float64()),
            }
        ),
        os.path.join(out_dir, "ann_lsh_topk.parquet"),
    )

    ivf = golden_ann_ivf(
        et.column("vec_id").to_pylist(),
        et.column("embedding").to_pylist(),
        sample_mod=2,
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in ivf], pa.int64()),
                "cosine": pa.array([r[1] for r in ivf], pa.float64()),
            }
        ),
        os.path.join(out_dir, "ann_ivf_topk.parquet"),
    )

    sd = golden_semdedup(
        et.column("vec_id").to_pylist(),
        et.column("embedding").to_pylist(),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in sd], pa.int64()),
                "ivf_cell": pa.array([r[1] for r in sd], pa.int32()),
            }
        ),
        os.path.join(out_dir, "semdedup_keep.parquet"),
    )
    # hot-cluster-capped mode (VERDICT r06 #6): cap 35 really excludes
    # cells at sf0.01 (4 of 16), so the capped contract is not vacuous
    sdc = golden_semdedup(
        et.column("vec_id").to_pylist(),
        et.column("embedding").to_pylist(),
        max_cell_size=35,
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in sdc], pa.int64()),
                "ivf_cell": pa.array([r[1] for r in sdc], pa.int32()),
            }
        ),
        os.path.join(out_dir, "semdedup_keep_capped.parquet"),
    )

    np_pairs = golden_lsh_near_pairs(
        et.column("vec_id").to_pylist(), et.column("embedding").to_pylist()
    )
    pq.write_table(
        pa.table(
            {
                "id_a": pa.array([r[0] for r in np_pairs], pa.int64()),
                "id_b": pa.array([r[1] for r in np_pairs], pa.int64()),
                "cosine": pa.array([r[2] for r in np_pairs], pa.float64()),
            }
        ),
        os.path.join(out_dir, "lsh_near_pairs.parquet"),
    )

    keep = golden_near_dedup_keep([d for d, _ in docs], mh)
    pq.write_table(
        pa.table({"doc_id": pa.array(keep, pa.int64())}),
        os.path.join(out_dir, "minhash_keep.parquet"),
    )

    # embedding-level keep set: union-find over the banded-LSH pair golden
    ekeep = golden_near_dedup_keep(et.column("vec_id").to_pylist(), np_pairs)
    pq.write_table(
        pa.table({"vec_id": pa.array(ekeep, pa.int64())}),
        os.path.join(out_dir, "embed_keep.parquet"),
    )

    # stratified mixing sample (dyadic rates: exact in float64 → the
    # double→long truncation agrees between Spark and the replica)
    lt = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    strat = golden_stratified_sample(
        list(zip(lt.column("doc_id").to_pylist(), lt.column("lang").to_pylist())),
        rates={"en": 1.0, "de": 0.5, "fr": 0.25, "zh": 0.125},
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in strat], pa.int64()),
                "lang": pa.array([r[1] for r in strat], pa.string()),
            }
        ),
        os.path.join(out_dir, "stratified_sample.parquet"),
    )

    # temperature-rebalanced multilingual sample (XLM-R q_l ∝ p_l^α)
    temp = golden_temperature_sample(
        list(zip(lt.column("doc_id").to_pylist(), lt.column("lang").to_pylist()))
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in temp], pa.int64()),
                "lang": pa.array([r[1] for r in temp], pa.string()),
            }
        ),
        os.path.join(out_dir, "temperature_sample.parquet"),
    )

    # token-budget corpus mixing (budgets over source strata; n_chars
    # stands in as the token-mass column — the op is tokens_col-agnostic)
    st = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )
    tb = golden_token_budget_sample(
        list(zip(
            st.column("doc_id").to_pylist(),
            st.column("source").to_pylist(),
            st.column("n_chars").to_pylist(),
        )),
        TOKEN_BUDGET_CONTRACT,
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in tb], pa.int64()),
                "source": pa.array([r[1] for r in tb], pa.string()),
            }
        ),
        os.path.join(out_dir, "token_budget_sample.parquet"),
    )

    # deterministic epoch shuffle (hash-shard + intra-shard order)
    es = golden_epoch_shuffle(lt.column("doc_id").to_pylist())
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in es], pa.int64()),
                "shard": pa.array([r[1] for r in es], pa.int32()),
                "pos": pa.array([r[2] for r in es], pa.int32()),
            }
        ),
        os.path.join(out_dir, "epoch_shuffle.parquet"),
    )

    # incremental (new-vs-reference) dedup: odd doc_ids vs even doc_ids
    inc = golden_incremental_dedup(
        [(d, t) for d, t in docs if d % 2 == 1],
        [(d, t) for d, t in docs if d % 2 == 0],
    )
    pq.write_table(
        pa.table({"doc_id": pa.array(inc, pa.int64())}),
        os.path.join(out_dir, "incremental_dedup.parquet"),
    )

    hs = golden_hash_split([d for d, _ in docs])
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in hs], pa.int64()),
                "split": pa.array([r[1] for r in hs], pa.string()),
            }
        ),
        os.path.join(out_dir, "hash_split.parquet"),
    )

    # zlib compression ratio (shares Python's zlib with the Spark-side
    # pandas UDF — the oracle pins determinism + plumbing, documented in
    # __spark_entry__; the ratio math itself is trivial)
    import zlib

    cr_rows = []
    for doc_id, text in docs:
        raw = (text or "").encode("utf-8")
        ratio = round(len(zlib.compress(raw, 6)) / len(raw), 4) if raw else 0.0
        cr_rows.append((doc_id, len(text or ""), ratio))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in cr_rows], pa.int64()),
                "n_chars": pa.array([r[1] for r in cr_rows], pa.int64()),
                "zlib_ratio": pa.array([r[2] for r in cr_rows], pa.float64()),
            }
        ),
        os.path.join(out_dir, "compression_ratio.parquet"),
    )

    with open(marker, "w") as f:
        f.write(GOLDEN_VERSION)
    return out_dir


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    d = ensure_golden(sf_dir)
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            print(f, pq.read_table(os.path.join(d, f)).num_rows, "rows")
