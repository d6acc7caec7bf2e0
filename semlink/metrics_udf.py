"""Vectorized string-similarity kernels (SURVEY X3/X4, §7.3 item 2).

The north rule mandates "batched Jaro-Winkler/Levenshtein ... as
vectorized pandas/Arrow UDFs (no per-row Python)". No string-metric
library exists in the sandbox, so both metrics are implemented as
batch-parallel numpy dynamic programs:

- Levenshtein: classic row-sweep DP, vectorized ACROSS the batch; the
  in-row left-neighbor dependency is resolved with the min-plus
  prefix-scan identity  min_k≤j (v[k] + (j-k)) = j + cummin(v - j).
- Jaro-Winkler: greedy window matching as a sweep over s1 positions with
  per-pair numpy state; transpositions via cumsum scatter of matched
  chars. Matches the textbook definition (Winkler prefix boost, scaling
  0.1, prefix ≤ 4, boost threshold 0.7) — unit-tested against DuckDB's
  `jaro_winkler_similarity` / `levenshtein` on random strings.

Strings are truncated to ``max_len`` (default 64) code points — anchor
surface forms are short; the cap bounds the O(L²) DP (documented
SURVEY §7.3.2). Arrow moves the batches; Python never sees a row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

CHUNK = 4096          # bound the (chunk, L, L) scratch tensors
DEFAULT_MAX_LEN = 64


def _encode(strs: pd.Series, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, max_len) int32 codepoint matrix (0-padded) + (N,) lengths."""
    s = strs.fillna("").astype(str).str.slice(0, max_len)
    lens = s.str.len().to_numpy(dtype=np.int32)
    n = len(s)
    mat = np.zeros((n, max_len), dtype=np.int32)
    # single pass via concatenated codepoints (no per-row Python work
    # beyond the C-implemented str join/ord path)
    joined = "".join(s.tolist())
    if joined:
        flat = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
        idx = np.repeat(np.arange(n), lens)
        pos = np.arange(len(flat)) - np.repeat(np.cumsum(lens) - lens, lens)
        mat[idx, pos] = flat
    return mat, lens


def levenshtein_batch(a: pd.Series, b: pd.Series,
                      max_len: int = DEFAULT_MAX_LEN) -> np.ndarray:
    out = np.empty(len(a), dtype=np.int64)
    for lo in range(0, len(a), CHUNK):
        hi = min(lo + CHUNK, len(a))
        out[lo:hi] = _lev_chunk(a.iloc[lo:hi], b.iloc[lo:hi], max_len)
    return out


def _lev_chunk(a: pd.Series, b: pd.Series, max_len: int) -> np.ndarray:
    A, la = _encode(a, max_len)
    B, lb = _encode(b, max_len)
    n = len(la)
    L2 = int(lb.max()) if n else 0
    L1 = int(la.max()) if n else 0
    j_idx = np.arange(L2 + 1)
    row = np.broadcast_to(j_idx, (n, L2 + 1)).astype(np.int32).copy()
    for i in range(1, L1 + 1):
        active = la >= i                                  # pairs still in play
        cost = (A[:, i - 1:i] != B[:, :L2]).astype(np.int32)
        new = np.empty_like(row)
        new[:, 0] = i
        # substitution / insertion candidates
        new[:, 1:] = np.minimum(row[:, :-1] + cost, row[:, 1:] + 1)
        # deletion (left-neighbor) via min-plus prefix scan
        new = np.minimum.accumulate(new - j_idx, axis=1) + j_idx
        row = np.where(active[:, None], new, row)
    return row[np.arange(n), np.minimum(lb, L2)].astype(np.int64)


def jaro_winkler_batch(a: pd.Series, b: pd.Series,
                       max_len: int = DEFAULT_MAX_LEN,
                       prefix_scale: float = 0.1,
                       boost_threshold: float = 0.7) -> np.ndarray:
    out = np.empty(len(a), dtype=np.float64)
    for lo in range(0, len(a), CHUNK):
        hi = min(lo + CHUNK, len(a))
        out[lo:hi] = _jw_chunk(a.iloc[lo:hi], b.iloc[lo:hi], max_len,
                               prefix_scale, boost_threshold)
    return out


def _jw_chunk(a: pd.Series, b: pd.Series, max_len: int,
              prefix_scale: float, boost_threshold: float) -> np.ndarray:
    A, la = _encode(a, max_len)
    B, lb = _encode(b, max_len)
    n = len(la)
    if n == 0:
        return np.zeros(0)
    L1 = int(la.max())
    L2 = int(lb.max())
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)       # (n,)
    j_idx = np.arange(max(L2, 1))
    valid2 = j_idx[None, :] < lb[:, None]
    B = B[:, :max(L2, 1)]

    matched1 = np.zeros((n, max(L1, 1)), dtype=bool)
    matched2 = np.zeros((n, max(L2, 1)), dtype=bool)
    for i in range(L1):
        in_play = la > i
        lo_w = i - window
        hi_w = i + window
        cand = (
            in_play[:, None]
            & valid2
            & ~matched2
            & (j_idx[None, :] >= lo_w[:, None])
            & (j_idx[None, :] <= hi_w[:, None])
            & (B == A[:, i:i + 1])
        )
        has = cand.any(axis=1)
        first = cand.argmax(axis=1)
        matched1[has, i] = True
        matched2[has, first[has]] = True

    m = matched1.sum(axis=1)

    # transpositions: compare matched chars of s1 (in s1 order) with
    # matched chars of s2 (in s2 order)
    max_m = int(m.max()) if n else 0
    t = np.zeros(n, dtype=np.int64)
    if max_m > 0:
        M1 = np.zeros((n, max_m), dtype=np.int32)
        M2 = np.zeros((n, max_m), dtype=np.int32)
        r1, c1 = np.nonzero(matched1)
        o1 = (np.cumsum(matched1, axis=1) - 1)[r1, c1]
        M1[r1, o1] = A[r1, c1]
        r2, c2 = np.nonzero(matched2)
        o2 = (np.cumsum(matched2, axis=1) - 1)[r2, c2]
        M2[r2, o2] = B[r2, c2]
        t = ((M1 != M2) & (np.arange(max_m)[None, :] < m[:, None])).sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (
            m / np.maximum(la, 1)
            + m / np.maximum(lb, 1)
            + (m - t) / np.maximum(m, 1)
        ) / 3.0
    # m == 0 (incl. both-empty) → 0.0, matching DuckDB's
    # jaro_winkler_similarity (textbook would give 1.0 for ''≡'';
    # we follow the oracle for testability)
    jaro = np.where(m == 0, 0.0, jaro)

    # Winkler prefix boost. Compare at most the narrower matrix's
    # width: B is trimmed to max(L2, 1) above, so a batch whose
    # b-side strings are ALL shorter than 4 chars would otherwise
    # broadcast-fail; positions >= lb are masked by the length
    # condition regardless, so the truncation never changes a value.
    pw = min(4, A.shape[1], B.shape[1])
    pref_eq = (A[:, :pw] == B[:, :pw]) & (np.arange(pw)[None, :] < np.minimum(la, lb)[:, None])
    ell = np.where(pref_eq.cumprod(axis=1).astype(bool), 1, 0).sum(axis=1)
    jw = np.where(jaro > boost_threshold,
                  jaro + prefix_scale * ell * (1.0 - jaro), jaro)
    return jw


# affine-gap scoring parameters (integers so every DP cell is exact):
# match +2, mismatch -1, gap open -3, gap extend -1 — the classic
# record-linkage setting (Bilenko-Mooney KDD'03 §3 uses this shape)
AG_MATCH = 2
AG_MISMATCH = 1
AG_OPEN = 3
AG_EXTEND = 1
_NEG = -(1 << 30)


def affine_gap_batch(a: pd.Series, b: pd.Series,
                     max_len: int = DEFAULT_MAX_LEN) -> np.ndarray:
    """Gotoh global alignment score with affine gaps (Gotoh '82) —
    THE name comparator for truncation/insertion-style corruptions: a
    single long gap costs open + (g-1)·extend, so "Smith" vs
    "Smith, John" scores far better than under Levenshtein's linear
    per-character penalty.

    Batch-parallel numpy DP, one row sweep over the a-side: M and Ix
    rows depend only on the previous row (fully vectorized over j and
    the batch); the in-row Iy dependency has the affine closed form
    Iy[i][j] = max_{k<j}(M[i][k] − open − extend·(j−1−k)), a running
    maximum of M[i][k] + extend·k (np.maximum.accumulate) — no
    per-cell Python. Integer parameters keep every cell exact.
    Returns int64 raw scores; both-empty pairs score 0.
    """
    out = np.empty(len(a), dtype=np.int64)
    for lo in range(0, len(a), CHUNK):
        hi = min(lo + CHUNK, len(a))
        out[lo:hi] = _ag_chunk(a.iloc[lo:hi], b.iloc[lo:hi], max_len)
    return out


def _ag_chunk(a: pd.Series, b: pd.Series, max_len: int) -> np.ndarray:
    A, la = _encode(a, max_len)
    B, lb = _encode(b, max_len)
    n = len(la)
    w = int(lb.max(initial=0)) + 1
    jj = np.arange(w, dtype=np.int64)
    # row 0: M[0][0]=0, Iy[0][j]=-(open+extend*(j-1)) for j>=1
    m_prev = np.full((n, w), _NEG, dtype=np.int64)
    m_prev[:, 0] = 0
    ix_prev = np.full((n, w), _NEG, dtype=np.int64)
    iy_prev = np.full((n, w), _NEG, dtype=np.int64)
    if w > 1:
        iy_prev[:, 1:] = -(AG_OPEN + AG_EXTEND * (jj[1:] - 1))
    final = np.zeros(n, dtype=np.int64)
    done = la == 0
    best0 = np.maximum(m_prev, iy_prev)
    final[done] = best0[done, lb[done]]
    max_la = int(la.max(initial=0))
    for i in range(1, max_la + 1):
        prev3 = np.maximum(np.maximum(m_prev, ix_prev), iy_prev)
        sub = np.where(B[:, :w - 1] == A[:, i - 1][:, None],
                       AG_MATCH, -AG_MISMATCH).astype(np.int64)
        m_cur = np.full((n, w), _NEG, dtype=np.int64)
        m_cur[:, 1:] = prev3[:, :-1] + sub
        ix_cur = np.maximum(m_prev - AG_OPEN, ix_prev - AG_EXTEND)
        # Iy closed form: running max of M[i][k] + extend*k
        t = np.maximum.accumulate(m_cur + AG_EXTEND * jj, axis=1)
        iy_cur = np.full((n, w), _NEG, dtype=np.int64)
        if w > 1:
            iy_cur[:, 1:] = (t[:, :-1] - AG_OPEN
                             - AG_EXTEND * (jj[1:] - 1))
        # gaps spanning the start: Ix[i][0] opens from M[0][0]
        ix_cur[:, 0] = np.maximum(ix_cur[:, 0],
                                  -(AG_OPEN + AG_EXTEND * (i - 1)))
        at = la == i
        if at.any():
            best = np.maximum(np.maximum(m_cur, ix_cur), iy_cur)
            final[at] = best[at, lb[at]]
        m_prev, ix_prev, iy_prev = m_cur, ix_cur, iy_cur
    return final


def affine_gap_sim6(a: pd.Series, b: pd.Series,
                    max_len: int = DEFAULT_MAX_LEN) -> np.ndarray:
    """Scaled-bigint normalized affine-gap similarity:
    sim6 = round(1e6 · score / (AG_MATCH · max(la, lb))) clamped to
    ≥ 0; two empty strings are identical (1e6). Normalization by the
    longer side makes equal strings exactly 1e6 and keeps the score
    comparable across lengths."""
    score = affine_gap_batch(a, b, max_len)
    la = a.fillna("").astype(str).str.slice(0, max_len).str.len().to_numpy()
    lb = b.fillna("").astype(str).str.slice(0, max_len).str.len().to_numpy()
    denom = AG_MATCH * np.maximum(np.maximum(la, lb), 1)
    sim = np.round(score / denom * 1_000_000).astype(np.int64)
    sim = np.maximum(sim, 0)
    sim[(la == 0) & (lb == 0)] = 1_000_000
    return sim


def synthesize_alignment_pairs(n_groups: int = 50) -> list:
    """Deterministic string pairs for the rl_affine_gap contract
    entry (sf-independent, like the media fixtures): per group an
    md5-derived base name and four comparison kinds —

    - 'equal': the base itself (sim6 must be exactly 1e6);
    - 'block': ONE contiguous md5-derived 6-char block inserted
      mid-string (the corruption affine gaps are FOR — pays one gap
      open + 5 extends);
    - 'scatter': the SAME six characters inserted ONE AT A TIME at
      spread positions (six gap opens) — same final length as
      'block', so sim6(block) > sim6(scatter) in every group is a
      structural invariant of affine gaps;
    - 'unrelated': a different group's base shape.

    Returns [(pair_id, kind, a, b), ...].
    """
    out = []
    for g in range(n_groups):
        hx = hashlib.md5(f"ag{g}".encode()).hexdigest()
        base = "".join(chr(ord("a") + int(c, 16) % 26) for c in hx[:20])
        blk = "".join(chr(ord("a") + int(c, 16) % 26) for c in hx[20:26])
        cut = 4 + int(hx[26], 16) % 12
        block = base[:cut] + blk + base[cut:]
        sc = list(base)
        for j in range(6):
            # one insertion every ~3 surviving base chars, back to
            # front so earlier offsets stay valid
            pos = len(base) - 2 - 3 * j
            sc.insert(pos, blk[j])
        scatter = "".join(sc)
        hx2 = hashlib.md5(f"ag{g}x".encode()).hexdigest()
        other = "".join(chr(ord("a") + int(c, 16) % 26) for c in hx2[:20])
        out.append((f"ag{g}_equal", "equal", base, base))
        out.append((f"ag{g}_block", "block", base, block))
        out.append((f"ag{g}_scatter", "scatter", base, scatter))
        out.append((f"ag{g}_unrelated", "unrelated", base, other))
    return out
