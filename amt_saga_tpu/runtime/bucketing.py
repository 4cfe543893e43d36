"""Static length buckets for the corpus runner (SURVEY.md §7).

XLA programs have static shapes: every distinct padded waveform length is
a separate compile (minutes on the axon backend), but padding every clip
to one global max length makes a single long outlier inflate EVERY
batch's compute.  This module picks k *static* bucket lengths that
minimize total padded samples, so a corpus with one 10x outlier pays the
outlier's cost only for the outlier's own bucket.

Stability contract (SURVEY.md §5 failure recovery): buckets are a pure
function of the FULL corpus length multiset — not of the not-yet-done
remainder — so a resumed run recomputes identical buckets and reuses the
already-compiled (AOT-cached) shapes.
"""

from __future__ import annotations


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def choose_length_buckets(lengths: list[int], max_buckets: int,
                          quantum: int, slack: float = 0.05) -> list[int]:
    """Pick ascending bucket lengths (each a ``quantum`` multiple).

    Lengths are first rounded up to ``quantum`` (the sample count of one
    frame-grid pad unit — finer distinctions compile to the same frame
    count anyway).  A dynamic program then minimizes the total padded
    samples over all clips for each bucket count j <= max_buckets, and
    the SMALLEST j whose cost is within ``slack`` of the max_buckets
    optimum wins: a uniform corpus stays at one compile, an outlier
    corpus gets exactly the buckets that pay for themselves.

    Every clip is assigned the smallest bucket >= its length; the last
    bucket is always the (quantized) corpus max.
    """
    if not lengths:
        return []
    q = [_round_up(max(n, 1), quantum) for n in lengths]
    uniq = sorted(set(q))
    m = len(uniq)
    if m == 1 or max_buckets <= 1:
        return [uniq[-1]]
    weight = {u: 0 for u in uniq}
    for n in q:
        weight[n] += 1
    w = [weight[u] for u in uniq]
    # prefix[i] = number of clips with length <= uniq[i-1]
    prefix = [0] * (m + 1)
    for i in range(m):
        prefix[i + 1] = prefix[i] + w[i]

    def seg_cost(lo: int, hi: int) -> int:
        # clips in uniq(lo..hi] all pad to uniq[hi-1]
        return uniq[hi - 1] * (prefix[hi] - prefix[lo])

    kmax = min(max_buckets, m)
    inf = float("inf")
    # dp[j][i] = min cost of covering the first i lengths with j buckets
    dp = [[inf] * (m + 1) for _ in range(kmax + 1)]
    cut = [[0] * (m + 1) for _ in range(kmax + 1)]
    dp[0][0] = 0.0
    for j in range(1, kmax + 1):
        for i in range(1, m + 1):
            for p in range(j - 1, i):
                c = dp[j - 1][p] + seg_cost(p, i)
                if c < dp[j][i]:
                    dp[j][i], cut[j][i] = c, p
    best = dp[kmax][m]
    for j in range(1, kmax + 1):
        if dp[j][m] <= best * (1.0 + slack):
            k = j
            break
    bounds = []
    i = m
    for j in range(k, 0, -1):
        bounds.append(uniq[i - 1])
        i = cut[j][i]
    return bounds[::-1]


def bucket_for(n: int, buckets: list[int], quantum: int) -> int:
    """Smallest bucket length >= n.  A clip longer than every planned
    bucket (e.g. added to the corpus after a resume) gets its own
    quantized length — one extra compile, never a truncation."""
    for b in buckets:
        if n <= b:
            return b
    return _round_up(n, quantum)
