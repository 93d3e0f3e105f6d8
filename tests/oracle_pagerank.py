"""NumPy oracle implementing exactly the reference PageRank recurrence
(mr-pr-cpp.cpp:110-180). Serves as the golden-output generator for the
reference-parity test track (SURVEY.md §5.3 track 1)."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int]],
    alpha: float = 0.85,
    convergence: float = 1e-5,
    max_iterations: int = 10000,
    n: int | None = None,
) -> tuple[np.ndarray, int]:
    """Returns (rank vector over dense ids 0..n-1, iteration count)."""
    if n is None:
        n = max(max(s, d) for s, d in edges) + 1
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    # incoming contributions as a (dst <- src) multi-edge list
    srcs = np.array([s for s, _ in edges], dtype=np.int64)
    dsts = np.array([d for _, d in edges], dtype=np.int64)

    pr = np.zeros(n)
    pr[0] = 1.0
    old_pr = np.zeros(n)
    diff = 1.0
    it = 0
    while diff > convergence and it < max_iterations:
        sum_pr = pr.sum()
        dangling_pr = pr[outdeg == 0].sum()
        if it == 0:
            old_pr = pr.copy()
        else:
            old_pr = pr / sum_pr
        one_Av = alpha * dangling_pr / n
        one_Iv = (1.0 - alpha) / n
        # h[i] = sum over edges (s -> i) of old_pr[s] / outdeg[s]
        contrib = old_pr[srcs] / outdeg[srcs]
        h = np.bincount(dsts, weights=contrib, minlength=n)
        pr = alpha * h + one_Av + one_Iv
        diff = np.abs(pr - old_pr).sum()
        it += 1
    return pr, it


def gen_barabasi(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Preferential-attachment edge list like test/barabasi-*.txt
    (n-1 edges, heavy-tailed in-degree)."""
    rng = np.random.default_rng(seed)
    edges = [(1, 0)]
    targets = [0, 1]
    for v in range(2, n):
        t = targets[rng.integers(0, len(targets))]
        edges.append((v, t))
        targets.extend([v, t])
    return edges


def gen_erdos(n: int, n_edges: int | None = None, seed: int = 42) -> list[tuple[int, int]]:
    """Sparse uniform random digraph like test/erdos-*.txt (~n/2 edges);
    includes duplicate edges and self-loops, which the reference allows."""
    rng = np.random.default_rng(seed)
    m = n_edges if n_edges is not None else n // 2
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return list(zip(src.tolist(), dst.tolist()))


# A 5-vertex graph with a dangling node (4 has no outgoing edge), a
# source node (no incoming to 0), a self-loop and a duplicate edge —
# the stressors FIXTURES.md Track A asks for.
SMALL_GRAPH = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (1, 1), (0, 2)]


def ppr_oracle(
    edges: list[tuple[int, int]],
    sources: list[int],
    alpha: float = 0.85,
    convergence: float = 1e-5,
    max_iterations: int = 10000,
    n: int | None = None,
) -> tuple[np.ndarray, int]:
    """Personalized variant of :func:`pagerank_oracle`: init, damping
    teleport and dangling mass all flow to ``sources`` (1/|S| each)."""
    if n is None:
        n = max(max(s, d) for s, d in edges) + 1
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    srcs = np.array([s for s, _ in edges], dtype=np.int64)
    dsts = np.array([d for _, d in edges], dtype=np.int64)

    tele = np.zeros(n)
    tele[np.array(sorted(set(sources)))] = 1.0 / len(set(sources))
    pr = tele.copy()
    diff = 1.0
    it = 0
    while diff > convergence and it < max_iterations:
        sum_pr = pr.sum()
        dangling_pr = pr[outdeg == 0].sum()
        old_pr = pr.copy() if it == 0 else pr / sum_pr
        contrib = old_pr[srcs] / outdeg[srcs]
        h = np.bincount(dsts, weights=contrib, minlength=n)
        pr = alpha * h + (alpha * dangling_pr) * tele + (1.0 - alpha) * tele
        diff = np.abs(pr - old_pr).sum()
        it += 1
    return pr, it
