"""Search for Williamson quadruples of odd order t (=> Hadamard order 4t).

Finds symmetric +-1 sequences A,B,C,D of length t whose periodic
autocorrelations satisfy PAF_A(s)+PAF_B(s)+PAF_C(s)+PAF_D(s) = 0 for
s=1..t-1 (equivalently their circulants obey A^2+B^2+C^2+D^2 = 4t I), the
condition under which the Williamson array is a Hadamard matrix of order 4t
(core/hadamard.py builds it). The reference ships hardcoded tables for
orders 92/156/172 (hadamard_utils.py:15-35); this search regenerates the
underlying quadruples instead of copying thousands of lines of constants.

Method (classic Williamson search, vectorized):
 1. enumerate all 2^((t+1)/2) symmetric sequences; fix seq[0] = +1
    (negation leaves the PAF unchanged);
 2. keep those whose power spectral density is <= 4t everywhere (PSDs are
    nonnegative and must SUM to 4t across the quadruple);
 3. rowsums must satisfy a^2+b^2+c^2+d^2 = 4t; for each admissible rowsum
    quadruple, meet in the middle: hash every (A,B) pair that passes the
    pairwise bound psd_A+psd_B <= 4t to an int64 fingerprint of its PAF-sum
    vector, sort, then probe with (C,D) pairs needing PAF_CD = -PAF_AB and
    verify candidates exactly.

Usage: python tools/williamson_search.py 39        # order 156
       python tools/williamson_search.py 43        # order 172
Prints the first quadruple found as Python tuples for hadamard.py.
"""
import itertools
import sys
import time

import numpy as np


def symmetric_seqs(t: int) -> np.ndarray:
    """All symmetric +-1 sequences of odd length t with seq[0] = +1,
    shape (2^((t-1)/2), t)."""
    half = (t - 1) // 2
    n = 1 << half
    bits = ((np.arange(n, dtype=np.uint32)[:, None] >> np.arange(half, dtype=np.uint32)[None, :]) & 1).astype(np.int8)
    seqs = np.empty((n, t), np.int8)
    signs = (2 * bits - 1).astype(np.int8)
    seqs[:, 0] = 1
    seqs[:, 1 : half + 1] = signs
    seqs[:, half + 1 :] = signs[:, ::-1]  # mirror: s[k] == s[t-k]
    return seqs


def paf(seqs: np.ndarray) -> np.ndarray:
    """Integer periodic autocorrelations, shape (N, t); column 0 == t."""
    f = np.fft.rfft(seqs.astype(np.float64), axis=1)
    p = np.fft.irfft(f * np.conj(f), n=seqs.shape[1], axis=1)
    return np.rint(p).astype(np.int64)


def _pair_side(psd, pafs, ia, ib, four_t, hash_vec, negate, dedup, log):
    """All (i in ia, j in ib) pairs passing the pairwise PSD bound, as
    (sorted int64 fingerprints of +-(PAF_i+PAF_j), order, i-array, j-array)."""
    hashes, iis, jjs = [], [], []
    t0 = time.time()
    for n, i in enumerate(ia):
        cand = ib[ib >= i] if dedup else ib
        if len(cand) == 0:
            continue
        ok = ((psd[cand] + psd[i]) <= four_t + 1e-6).all(axis=1)
        js = cand[ok]
        if len(js) == 0:
            continue
        ps = pafs[js] + pafs[i]
        if negate:
            ps = -ps
        hashes.append(ps @ hash_vec)  # int64 wraparound fingerprint
        iis.append(np.full(len(js), i, np.int32))
        jjs.append(js.astype(np.int32))
        if n % 4096 == 0 and n:
            log(f"    pair side {n}/{len(ia)} ({sum(map(len, jjs))} pairs, {time.time()-t0:.0f}s)")
    if not hashes:
        return None
    h = np.concatenate(hashes)
    order = np.argsort(h, kind="stable")
    return h[order], order, np.concatenate(iis), np.concatenate(jjs)


def search(t: int, log=print):
    four_t = 4 * t
    m = (t - 1) // 2
    seqs = symmetric_seqs(t)
    # PSD filter in chunks
    keep = []
    for lo in range(0, len(seqs), 1 << 18):
        chunk = seqs[lo : lo + (1 << 18)]
        psd_c = np.abs(np.fft.rfft(chunk.astype(np.float64), axis=1)) ** 2
        keep.append(chunk[psd_c.max(axis=1) <= four_t + 1e-6])
    seqs = np.concatenate(keep)
    log(f"t={t}: {len(seqs)} sequences survive the PSD<=4t filter")
    psd = (np.abs(np.fft.rfft(seqs.astype(np.float64), axis=1)) ** 2)[:, 1 : m + 1]
    pafs = paf(seqs)[:, 1 : m + 1]  # s=1..(t-1)/2 (PAF is symmetric)
    sums = np.abs(seqs.sum(axis=1).astype(np.int64))

    by_sum = {int(s): np.where(sums == s)[0] for s in np.unique(sums)}
    quads = [
        q for q in itertools.combinations_with_replacement(sorted(by_sum), 4)
        if sum(x * x for x in q) == four_t
    ]
    # hash the smallest pair-side first (memory: the AB table holds every
    # surviving pair); try quads with the smallest total work first
    def cost(q):
        sizes = sorted(len(by_sum[x]) for x in q)
        return sizes[0] * sizes[1] + sizes[2] * sizes[3]
    quads = [
        tuple(sorted(q, key=lambda x: len(by_sum[x])))
        for q in sorted(quads, key=cost)
    ]
    log(f"t={t}: rowsum quadruples (ab=hashed side first) {quads}")

    rng = np.random.default_rng(0)
    hash_vec = rng.integers(1, 2**62, size=m, dtype=np.int64) | 1

    for quad in quads:
        a, b, c, d = quad
        log(f"t={t}: trying rowsums {quad}")
        ab = _pair_side(psd, pafs, by_sum[a], by_sum[b], four_t, hash_vec,
                        negate=False, dedup=(a == b), log=log)
        if ab is None:
            continue
        h_ab, order_ab, i_ab, j_ab = ab
        log(f"    AB side: {len(h_ab)} pairs hashed+sorted")
        # probe with (C,D): fingerprints of -(PAF_C+PAF_D) must match
        t0 = time.time()
        ic, id_ = by_sum[c], by_sum[d]
        for n, i in enumerate(ic):
            cand = id_[id_ >= i] if c == d else id_
            if len(cand) == 0:
                continue
            ok = ((psd[cand] + psd[i]) <= four_t + 1e-6).all(axis=1)
            js = cand[ok]
            if len(js) == 0:
                continue
            probe = (-(pafs[js] + pafs[i])) @ hash_vec
            pos = np.searchsorted(h_ab, probe)
            pos = np.minimum(pos, len(h_ab) - 1)
            hit = h_ab[pos] == probe
            for j, p in zip(js[hit], pos[hit]):
                # walk all equal-hash entries, verify exactly
                while p < len(h_ab) and h_ab[p] == (-(pafs[j] + pafs[i])) @ hash_vec:
                    k = order_ab[p]
                    A, B, C, D = seqs[i_ab[k]], seqs[j_ab[k]], seqs[i], seqs[j]
                    tot = paf(np.stack([A, B, C, D]))[:, 1:].sum(axis=0)
                    if (tot == 0).all():
                        log(f"t={t}: FOUND quadruple (rowsums {quad})")
                        for name, row in zip("ABCD", (A, B, C, D)):
                            log(f"  {name} = {tuple(int(x) for x in row)}")
                        return A, B, C, D
                    p += 1
            if n % 4096 == 0 and n:
                log(f"    probe {n}/{len(ic)} ({time.time()-t0:.0f}s)")
    log(f"t={t}: no quadruple found")
    return None


if __name__ == "__main__":
    for t_arg in [int(x) for x in sys.argv[1:]] or [39]:
        search(t_arg)
