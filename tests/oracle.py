"""Sequential numpy oracles — the engine's ground truth.

The reference checkout is an empty directory in this sandbox (SURVEY.md §0),
so these ~150 lines of textbook numpy stand in for "dynamicppr's
ground-truth outputs" (BASELINE.json north_star). The algorithms are public:
forward-push PPR is Andersen-Chung-Lang local push as used by the PVLDB'17
dynamic-PPR paper; the rest are standard.

Pinned semantics (the Spark kernels implement EXACTLY these):

  PPR (forward push, teleport alpha):
    state r (residual), pi (reserve); init r[s] = 1.
    Synchronous superstep: every vertex v with r[v] != 0 pushes
    simultaneously based on the state at the START of the superstep:
        pi[v] += alpha * r[v]
        each out-neighbor u:  r'[u] += (1-alpha) * r[v] / outdeg(v)
        dangling v (outdeg 0): self-loop — r'[v] += (1-alpha) * r[v]
    Stop when ||r||_1 <= eps. Because each superstep multiplies ||r||_1 by
    at most (1-alpha), this terminates, and the invariant
        ppr(s,t) = pi[t] + sum_v r[v] * ppr(v,t)
    bounds |pi[t] - ppr(s,t)| <= ||r||_1 <= eps for every t — so converged
    scores are within eps of the exact solution REGARDLESS of push order,
    which is what makes dynamic-vs-static comparison sound.

  PageRank (power iteration, teleport alpha=0.15):
    rank'[u] = alpha/N + (1-alpha) * (sum_{v->u} rank[v]/outdeg(v)
                                      + dangling_mass/N)
    dangling_mass = sum of rank over outdeg-0 vertices.
    Stop when max |rank' - rank| <= tol.

  Connected components: undirected; component id = min vid reachable.
  LPA: undirected, synchronous, fixed n_iter; new label = most frequent
    neighbor label, ties broken by MIN label; isolated vertices keep theirs.
  Triangles: undirected simple graph; count of {a<b<c} with all three edges.
"""

from __future__ import annotations

import numpy as np


def _adj(edges: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CSR-ish: sorted src, dst arrays + outdeg per vertex."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    order = np.lexsort((e[:, 1], e[:, 0]))
    e = e[order]
    outdeg = np.bincount(e[:, 0], minlength=n)
    return e[:, 0], e[:, 1], outdeg


def ppr_push_sync(
    edges: np.ndarray, n: int, source: int, alpha: float = 0.15, eps: float = 1e-6
) -> tuple[np.ndarray, np.ndarray, int]:
    """Synchronous forward-push PPR. Returns (reserve, residual, supersteps)."""
    src, dst, outdeg = _adj(edges, n)
    r = np.zeros(n, dtype=np.float64)
    pi = np.zeros(n, dtype=np.float64)
    r[source] = 1.0
    steps = 0
    while np.abs(r).sum() > eps:
        pi += alpha * r
        push = (1.0 - alpha) * r
        r_new = np.zeros(n, dtype=np.float64)
        # edge scatter: each out-edge carries push[src]/outdeg[src]
        contrib = push[src] / outdeg[src]
        np.add.at(r_new, dst, contrib)
        dangling = outdeg == 0
        r_new[dangling] += push[dangling]  # self-loop semantics
        r = r_new
        steps += 1
    return pi, r, steps


def ppr_exact(
    edges: np.ndarray, n: int, source: int, alpha: float = 0.15
) -> np.ndarray:
    """Exact PPR with dangling-self-loop semantics via linear solve."""
    src, dst, outdeg = _adj(edges, n)
    P = np.zeros((n, n), dtype=np.float64)  # row-stochastic transition
    P[src, dst] = 1.0 / outdeg[src]
    for v in np.nonzero(outdeg == 0)[0]:
        P[v, v] = 1.0
    e_s = np.zeros(n)
    e_s[source] = 1.0
    # pi = alpha * e_s + (1-alpha) * P^T pi  =>  (I - (1-alpha) P^T) pi = alpha e_s
    return np.linalg.solve(np.eye(n) - (1 - alpha) * P.T, alpha * e_s)


def pagerank(
    edges: np.ndarray,
    n: int,
    alpha: float = 0.15,
    tol: float = 1e-6,
    max_iter: int = 500,
) -> tuple[np.ndarray, int]:
    """Power-iteration PageRank with uniform dangling redistribution."""
    src, dst, outdeg = _adj(edges, n)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    dangling = outdeg == 0
    for it in range(1, max_iter + 1):
        contrib = np.zeros(n, dtype=np.float64)
        np.add.at(contrib, dst, rank[src] / outdeg[src])
        dm = rank[dangling].sum()
        new = alpha / n + (1 - alpha) * (contrib + dm / n)
        if np.max(np.abs(new - rank)) <= tol:
            return new, it
        rank = new
    return rank, max_iter


def connected_components(edges: np.ndarray, n: int) -> np.ndarray:
    """Undirected CC; label = min vid in component (union-find)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.array([find(v) for v in range(n)], dtype=np.int64)


def label_propagation(edges: np.ndarray, n: int, n_iter: int = 10) -> np.ndarray:
    """Synchronous undirected LPA, min-label tie-break, fixed iterations."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    und = np.vstack([e, e[:, ::-1]])
    und = np.unique(und[und[:, 0] != und[:, 1]], axis=0)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(n_iter):
        new = labels.copy()
        for v in range(n):
            nbrs = und[und[:, 0] == v, 1]
            if len(nbrs) == 0:
                continue
            lab, cnt = np.unique(labels[nbrs], return_counts=True)
            new[v] = lab[cnt == cnt.max()].min()
        labels = new
    return labels


def triangle_count(edges: np.ndarray, n: int) -> int:
    """Global triangle count of the undirected simple graph."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    und = {(min(a, b), max(a, b)) for a, b in e if a != b}
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)  # only higher neighbors
    total = 0
    for a, highs in nbrs.items():
        for b in highs:
            total += len(highs & nbrs.get(b, set()))
    return total


def seed_distances(
    edges: np.ndarray, n: int, seeds, max_hops: int | None = None
) -> dict[int, int]:
    """Directed multi-source BFS: {vid: min hops from any seed} for
    reachable vertices only (optionally truncated at ``max_hops``)."""
    from collections import deque

    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    adj: dict[int, list[int]] = {}
    for a, b in e:
        adj.setdefault(int(a), []).append(int(b))
    dist = {int(s): 0 for s in seeds if 0 <= int(s) < n}
    dq = deque(dist)
    while dq:
        v = dq.popleft()
        if max_hops is not None and dist[v] >= max_hops:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                dq.append(w)
    return dist


def k_core(edges: np.ndarray, n: int, k: int) -> dict[int, int]:
    """{vid: within-core degree} of the undirected k-core (synchronous
    peel: each round removes every vertex of current degree < k)."""
    e = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    und = {(min(a, b), max(a, b)) for a, b in e if a != b}
    nbrs: dict[int, set[int]] = {}
    for a, b in und:
        nbrs.setdefault(int(a), set()).add(int(b))
        nbrs.setdefault(int(b), set()).add(int(a))
    alive = set(nbrs)
    while True:
        doomed = {v for v in alive if len(nbrs[v] & alive) < k}
        if not doomed:
            return {v: len(nbrs[v] & alive) for v in alive}
        alive -= doomed


def weighted_seed_distances(
    edges_w: np.ndarray, n: int, seeds
) -> dict[int, float]:
    """Directed multi-source Bellman-Ford over (src, dst, w >= 0) rows:
    {vid: min path cost from any seed} for reachable vertices."""
    rows = [(int(a), int(b), float(w)) for a, b, w in edges_w]
    dist = {int(s): 0.0 for s in seeds if 0 <= int(s) < n}
    for _ in range(n):
        changed = False
        for a, b, w in rows:
            if a in dist and dist[a] + w < dist.get(b, float("inf")):
                dist[b] = dist[a] + w
                changed = True
        if not changed:
            break
    return dist
