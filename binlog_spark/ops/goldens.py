"""Sequential Python oracles for the hash-dependent operators.

SimHash / MinHash+LSH banding / n-gram Jaccard / random-hyperplane LSH /
IVF are not expressible in engine-portable SQL (their identity IS a
specific 64-bit hash function), so their DuckDB twins read GOLDEN PARQUET
produced here: a single-threaded, pure-Python replay of each operator's
spec over the same input tables — sharing only the *spec* with the
distributed implementation (the xxhash64 bit-exact reimplementation in
functions/spark_hash.py, verified against Spark in
tests/test_spark_hash.py, and the k-means sample routine whose output
values both engines consume).

Float determinism: every dot product / squared distance folds
sequentially in IEEE float64, exactly like Spark's
``aggregate(zip_with(...))``; rounding uses HALF_UP like Spark's
``F.round``.  That makes the goldens bit-identical, not just close.
"""

from __future__ import annotations

import math
import os
import re
from decimal import ROUND_HALF_UP, Decimal

from ..functions.spark_hash import xxhash64

GOLDEN_VERSION = "v3"

#: Java \s (no Unicode classes) — what Spark's split/trim see
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def tokens(text: str) -> list[str]:
    """Whitespace tokens with Spark semantics: F.trim strips SPACES only;
    split keeps leading/trailing empty fields (limit=-1)."""
    return _WS.split(text.strip(" "))


def round_half_up(v: float, scale: int) -> float:
    """Spark's F.round on doubles: BigDecimal.valueOf (shortest repr,
    same as Python repr) + HALF_UP."""
    return float(Decimal(repr(v)).quantize(Decimal(f"1e-{scale}"),
                                           rounding=ROUND_HALF_UP))


def _golden_path(name: str, sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/golden_{name}_{GOLDEN_VERSION}_{sf}.parquet"


def _write(path: str, columns: dict, types: dict) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq
    tbl = pa.table({k: pa.array(v, types[k]) for k, v in columns.items()})
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.rename(tmp, path)
    return path


def _docs(sf_dir: str) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))


def _embs(path: str) -> list[tuple[int, list[float]]]:
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    return [(i, [float(v) for v in e])
            for i, e in zip(t.column("vec_id").to_pylist(),
                            t.column("embedding").to_pylist())]


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _norm(a: list[float]) -> float:
    acc = 0.0
    for v in a:
        acc += v * v
    return math.sqrt(acc)


# --- text ops ---------------------------------------------------------------

def golden_doc_simhash(sf_dir: str) -> str:
    """ops.text.doc_simhash: per-token xxhash64, sign-summed bits."""
    out = _golden_path("doc_simhash", sf_dir)
    if os.path.exists(out):
        return out
    import pyarrow as pa
    hcache: dict[str, int] = {}
    ids, sims = [], []
    for doc_id, text in sorted(_docs(sf_dir)):
        counts = [0] * 64
        for tok in tokens(text):
            h = hcache.get(tok)
            if h is None:
                h = hcache[tok] = xxhash64(tok)
            for b in range(64):
                counts[b] += 1 if (h >> b) & 1 else -1
        sim = 0
        for b in range(64):
            if counts[b] > 0:
                sim += (1 << b) if b < 63 else -(1 << 63)
        ids.append(doc_id)
        sims.append(sim)
    return _write(out, {"doc_id": ids, "simhash64": sims},
                  {"doc_id": pa.int64(), "simhash64": pa.int64()})


def _shingle_sets(docs) -> dict[int, list[str]]:
    """Distinct word 3-grams per doc, in first-occurrence order (matches
    array_distinct over the transform output)."""
    n = 3
    out = {}
    for doc_id, text in docs:
        toks = tokens(text)
        seen = {}
        for i in range(max(len(toks) - n, 0) + 1):
            sh = " ".join(toks[i:i + n])
            if sh not in seen:
                seen[sh] = None
        out[doc_id] = list(seen)
    return out


N_HASHES = 32
BAND_SIZE = 4


def _minhash_signatures(sf_dir: str) -> dict[int, list[int]]:
    shingles = _shingle_sets(_docs(sf_dir))
    hcache: dict[str, list[int]] = {}
    sigs = {}
    for doc_id, shs in shingles.items():
        sig = [None] * N_HASHES
        for sh in shs:
            hs = hcache.get(sh)
            if hs is None:
                hs = hcache[sh] = [xxhash64(("int", seed), sh)
                                   for seed in range(N_HASHES)]
            for s in range(N_HASHES):
                if sig[s] is None or hs[s] < sig[s]:
                    sig[s] = hs[s]
        sigs[doc_id] = sig
    return sigs


def _minhash_pairs(sigs: dict[int, list[int]],
                   threshold: float) -> list[tuple[int, int, float]]:
    buckets: dict[tuple[int, int], list[int]] = {}
    n_bands = N_HASHES // BAND_SIZE
    for doc_id, sig in sigs.items():
        for b in range(n_bands):
            bucket = xxhash64(*sig[b * BAND_SIZE:(b + 1) * BAND_SIZE])
            buckets.setdefault((b, bucket), []).append(doc_id)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                if ms[i] < ms[j]:
                    cand.add((ms[i], ms[j]))
    pairs = []
    for a, b in sorted(cand):
        agree = sum(1 for i in range(N_HASHES) if sigs[a][i] == sigs[b][i])
        est = agree / N_HASHES
        if est >= threshold:
            pairs.append((a, b, est))
    return pairs


def golden_doc_minhash_dups(sf_dir: str) -> str:
    """ops.dedup.doc_minhash_dups: LSH-banded candidates + minhash-agree
    estimate at threshold 0.5."""
    out = _golden_path("doc_minhash_dups", sf_dir)
    if os.path.exists(out):
        return out
    import pyarrow as pa
    pairs = _minhash_pairs(_minhash_signatures(sf_dir), 0.5)
    return _write(out, {"doc_a": [p[0] for p in pairs],
                        "doc_b": [p[1] for p in pairs],
                        "est_jaccard": [p[2] for p in pairs]},
                  {"doc_a": pa.int64(), "doc_b": pa.int64(),
                   "est_jaccard": pa.float64()})


def golden_doc_ngram_jaccard(sf_dir: str) -> str:
    """ops.dedup.doc_ngram_jaccard: exact 3-gram Jaccard over the LSH
    candidates found at threshold 0.3, kept at ≥ 0.5."""
    out = _golden_path("doc_ngram_jaccard", sf_dir)
    if os.path.exists(out):
        return out
    import pyarrow as pa
    docs = _docs(sf_dir)
    shingles = {d: set(s) for d, s in _shingle_sets(docs).items()}
    cand = _minhash_pairs(_minhash_signatures(sf_dir), 0.3)
    rows = []
    for a, b, _ in cand:
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        if not inter:
            continue
        jac = round_half_up(inter / (len(sa) + len(sb) - inter), 4)
        if jac >= 0.5:
            rows.append((a, b, jac))
    rows.sort()
    return _write(out, {"doc_a": [r[0] for r in rows],
                        "doc_b": [r[1] for r in rows],
                        "jaccard": [r[2] for r in rows]},
                  {"doc_a": pa.int64(), "doc_b": pa.int64(),
                   "jaccard": pa.float64()})


def golden_doc_dedup_clusters(sf_dir: str) -> str:
    """ops.dedup.doc_dedup_clusters: sequential union-find over the same
    minhash near-dup pairs; cluster id = min doc_id of the component."""
    out = _golden_path("doc_dedup_clusters", sf_dir)
    if os.path.exists(out):
        return out
    import pyarrow as pa
    pairs = _minhash_pairs(_minhash_signatures(sf_dir), 0.5)
    doc_ids = sorted(d for d, _ in _docs(sf_dir))
    parent = {d: d for d in doc_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = {d: find(d) for d in doc_ids}
    sizes: dict[int, int] = {}
    for c in cluster.values():
        sizes[c] = sizes.get(c, 0) + 1
    return _write(out, {"doc_id": doc_ids,
                        "cluster_id": [cluster[d] for d in doc_ids],
                        "cluster_size": [sizes[cluster[d]]
                                         for d in doc_ids]},
                  {"doc_id": pa.int64(), "cluster_id": pa.int64(),
                   "cluster_size": pa.int64()})


# --- similarity ops ---------------------------------------------------------

N_PLANES = 6
N_TABLES = 4


def _plane_weights(dim: int) -> list[list[float]]:
    """Hash-derived hyperplane weights, identical to
    ops.similarity._plane_weights_expr:
    (pmod(xxhash64(seed:int, i:int), 2001) - 1000) / 1000."""
    out = []
    for seed in range(N_TABLES * N_PLANES):
        # Python's % is already non-negative for a positive modulus —
        # identical to Spark's pmod
        out.append([(xxhash64(("int", seed), ("int", i)) % 2001 - 1000)
                    / 1000.0 for i in range(dim)])
    return out


def _lsh_buckets(emb: list[float], planes: list[list[float]]) -> list[int]:
    """Per-table bucket ids (N_TABLES entries)."""
    buckets = []
    for t in range(N_TABLES):
        b = 0
        for p in range(N_PLANES):
            w = planes[t * N_PLANES + p]
            proj = 0.0
            for x, y in zip(emb, w):
                proj += x * y
            if proj > 0:
                b += 1 << p
        buckets.append(b)
    return buckets


def _topk_rows(pairs_by_q: dict[int, list[tuple[int, float]]],
               k: int) -> list[tuple[int, int, int, float]]:
    rows = []
    for q_id in sorted(pairs_by_q):
        ranked = sorted(pairs_by_q[q_id], key=lambda p: (-p[1], p[0]))[:k]
        for rank, (vec_id, cos) in enumerate(ranked, 1):
            rows.append((q_id, rank, vec_id, round_half_up(cos, 4)))
    return rows


def _write_topk(out: str, rows) -> str:
    import pyarrow as pa
    return _write(out, {"q_id": [r[0] for r in rows],
                        "rank": [r[1] for r in rows],
                        "vec_id": [r[2] for r in rows],
                        "cos": [r[3] for r in rows]},
                  {"q_id": pa.int64(), "rank": pa.int64(),
                   "vec_id": pa.int64(), "cos": pa.float64()})


N_PROBE_FLIPS = 2


def _query_probes(emb: list[float],
                  planes: list[list[float]]) -> list[set[int]]:
    """Per-table probed bucket sets: exact bucket + single-bit flips of
    the N_PROBE_FLIPS lowest-|projection| planes (mirror of
    ops.similarity._lsh_query_probes)."""
    out = []
    for t in range(N_TABLES):
        projs = []
        for p in range(N_PLANES):
            w = planes[t * N_PLANES + p]
            acc = 0.0
            for x, y in zip(emb, w):
                acc += x * y
            projs.append(acc)
        bucket = 0
        for p in range(N_PLANES):
            if projs[p] > 0:
                bucket += 1 << p
        margins = sorted((abs(projs[p]), p) for p in range(N_PLANES))
        probes = {bucket}
        for _, p in margins[:N_PROBE_FLIPS]:
            probes.add(bucket ^ (1 << p))
        out.append(probes)
    return out


def golden_ann_lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 3) -> str:
    """ops.similarity.ann_lsh_topk: multi-table MULTI-PROBE LSH
    candidates, exact cosine, top-k."""
    out = _golden_path("ann_lsh_topk", sf_dir)
    if os.path.exists(out):
        return out
    embs = _embs(f"{sf_dir}/embeddings.parquet")
    dim = len(embs[0][1])
    planes = _plane_weights(dim)
    buckets = {i: _lsh_buckets(e, planes) for i, e in embs}
    emap = dict(embs)
    by_q: dict[int, list[tuple[int, float]]] = {}
    queries = [(i, e) for i, e in embs if i < n_queries]
    for q_id, q_emb in queries:
        probes = _query_probes(q_emb, planes)
        nq = _norm(q_emb)
        cands = [i for i, _ in embs
                 if i != q_id and any(buckets[i][t] in probes[t]
                                      for t in range(N_TABLES))]
        by_q[q_id] = [(i, _dot(emap[i], q_emb) / (_norm(emap[i]) * nq))
                      for i in cands]
    return _write_topk(out, _topk_rows(by_q, k))


N_CELLS = 16
IVF_SAMPLE_CAP = 4096


def golden_ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 3,
                        n_probe: int = 6) -> str:
    """ops.similarity.ann_ivf_topk: same bounded sample, same
    kmeans_sample centroids, same sequential fold assignment."""
    out = _golden_path("ann_ivf_topk", sf_dir)
    if os.path.exists(out):
        return out
    from .similarity import _sqdist, kmeans_sample
    embs = _embs(f"{sf_dir}/embeddings.parquet")
    n = len(embs)
    stride = max(1, n // IVF_SAMPLE_CAP)
    sample = [e for i, e in sorted(embs) if i % stride == 0]
    cents = kmeans_sample(sample)

    def assign(e: list[float]) -> int:
        dists = [_sqdist(e, c) for c in cents]
        return dists.index(min(dists))

    cells = {i: assign(e) for i, e in embs}
    emap = dict(embs)
    by_q: dict[int, list[tuple[int, float]]] = {}
    for q_id, q_emb in [(i, e) for i, e in embs if i < n_queries]:
        d2 = sorted((_sqdist(q_emb, c), i) for i, c in enumerate(cents))
        probe = {cell for _, cell in d2[:n_probe]}
        nq = _norm(q_emb)
        by_q[q_id] = [
            (i, _dot(emap[i], q_emb) / (_norm(emap[i]) * nq))
            for i, _ in embs if i != q_id and cells[i] in probe]
    return _write_topk(out, _topk_rows(by_q, k))


def golden_embedding_neardup(sf_dir: str, threshold: float = 0.95) -> str:
    """ops.similarity.embedding_neardup: any-table LSH collision pairs
    over the planted-near-dup augmented table, exact cosine ≥ threshold."""
    out = _golden_path("embedding_neardup", sf_dir)
    if os.path.exists(out):
        return out
    import pyarrow as pa

    from .similarity import neardup_input_path
    embs = _embs(neardup_input_path(sf_dir))
    dim = len(embs[0][1])
    planes = _plane_weights(dim)
    buckets: dict[tuple[int, int], list[int]] = {}
    emap = dict(embs)
    for i, e in embs:
        for t, b in enumerate(_lsh_buckets(e, planes)):
            buckets.setdefault((t, b), []).append(i)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    rows = []
    for a, b in sorted(cand):
        ea, eb = emap[a], emap[b]
        cos = _dot(ea, eb) / (_norm(ea) * _norm(eb))
        if cos >= threshold:
            rows.append((a, b, round_half_up(cos, 4)))
    return _write(out, {"vec_a": [r[0] for r in rows],
                        "vec_b": [r[1] for r in rows],
                        "cos": [r[2] for r in rows]},
                  {"vec_a": pa.int64(), "vec_b": pa.int64(),
                   "cos": pa.float64()})
