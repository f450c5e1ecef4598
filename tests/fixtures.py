"""Deterministic test fixtures (FIXTURES.md; seed=42 everywhere).

Graph generators return (edges ndarray[m,2], n_vertices). The repo_files
generator returns a pandas DataFrame shaped exactly like the Iceberg corpus
in BASELINE.json input_hint: (repo, path, commit, lang, content).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42


# --------------------------------------------------------------- toy graphs
def path_graph(n: int = 10) -> tuple[np.ndarray, int]:
    e = np.array([(i, i + 1) for i in range(n - 1)], dtype=np.int64)
    return e, n


def cycle_graph(n: int = 12) -> tuple[np.ndarray, int]:
    e = np.array([(i, (i + 1) % n) for i in range(n)], dtype=np.int64)
    return e, n


def star_graph(n: int = 50) -> tuple[np.ndarray, int]:
    """Hub 0 -> spokes and spokes -> hub (hub skew both directions)."""
    e = [(0, i) for i in range(1, n)] + [(i, 0) for i in range(1, n)]
    return np.array(e, dtype=np.int64), n


def two_cliques_bridge(k: int = 6) -> tuple[np.ndarray, int]:
    """Two k-cliques (directed both ways) joined by one bridge edge."""
    e = []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    e.append((base + i, base + j))
    e.append((k - 1, k))  # bridge
    return np.array(e, dtype=np.int64), 2 * k


def rmat_graph(
    n: int = 2000, m: int = 16000, seed: int = SEED
) -> tuple[np.ndarray, int]:
    """RMAT-ish power-law digraph: skewed hubs for salting/skew coverage."""
    rng = np.random.default_rng(seed)
    scale = int(np.ceil(np.log2(n)))
    a, b, c = 0.57, 0.19, 0.19  # d = 0.05
    src = np.zeros(m * 2, dtype=np.int64)
    dst = np.zeros(m * 2, dtype=np.int64)
    for level in range(scale):
        r = rng.random(m * 2)
        bit_src = ((r >= a + b) & (r < a + b + c)) | (r >= a + b + c)
        bit_dst = ((r >= a) & (r < a + b)) | (r >= a + b + c)
        src = src * 2 + bit_src
        dst = dst * 2 + bit_dst
    keep = (src < n) & (dst < n) & (src != dst)
    e = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    return e[:m], n


ALL_GRAPHS = {
    "path": path_graph,
    "cycle": cycle_graph,
    "star": star_graph,
    "cliques": two_cliques_bridge,
    "rmat": rmat_graph,
}


# ------------------------------------------------------------- update scripts
def update_script(
    edges: np.ndarray, n: int, kind: str, n_batches: int = 3, seed: int = SEED
) -> pd.DataFrame:
    """Edge-update batches (FIXTURES.md §3): (batch_id, op, src, dst, ts).

    Batch semantics match LinkGraph.with_updates: within one batch, the new
    edge set is (old \\ deletes) ∪ inserts — deletes target only edges that
    existed BEFORE the batch, never same-batch inserts.
    """
    rng = np.random.default_rng(seed)
    existing = {(int(a), int(b)) for a, b in edges}
    rows: list[tuple[int, str, int, int]] = []
    for bid in range(n_batches):
        size = [1, 10, 100][min(bid, 2)]
        pre_batch = sorted(existing)  # delete pool: pre-batch edges only
        if kind in ("inserts", "mixed"):
            added = 0
            while added < size:
                s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
                if s != d and (s, d) not in existing:
                    rows.append((bid, "+", s, d))
                    existing.add((s, d))
                    added += 1
        if kind in ("deletes", "mixed"):
            idx = rng.choice(
                len(pre_batch), size=min(size, len(pre_batch) - 1), replace=False
            )
            for i in idx:
                s, d = pre_batch[i]
                rows.append((bid, "-", s, d))
                existing.discard((s, d))
        if kind == "hub":
            for _ in range(size):
                d = int(rng.integers(1, n))
                if (0, d) not in existing:
                    rows.append((bid, "+", 0, d))
                    existing.add((0, d))
    df = pd.DataFrame(rows, columns=["batch_id", "op", "src", "dst"])
    df["ts"] = pd.Timestamp("2026-01-01T00:00:00Z") + pd.to_timedelta(
        df["batch_id"], unit="m"
    )
    return df


def apply_script_numpy(edges: np.ndarray, script: pd.DataFrame) -> np.ndarray:
    """Sequentially apply update batches with with_updates semantics."""
    es = {(int(a), int(b)) for a, b in np.asarray(edges).reshape(-1, 2)}
    for bid in sorted(script["batch_id"].unique()):
        b = script[script["batch_id"] == bid]
        dels = {
            (int(r.src), int(r.dst)) for r in b[b["op"] == "-"].itertuples()
        }
        ins = {
            (int(r.src), int(r.dst)) for r in b[b["op"] == "+"].itertuples()
        }
        es = (es - dels) | ins
    return np.array(sorted(es), dtype=np.int64).reshape(-1, 2)


# ---------------------------------------------------------------- repo_files
def repo_files(
    n_repos: int = 4,
    paths_per_repo: int = 40,
    commits_per_repo: int = 12,
    seed: int = SEED,
) -> pd.DataFrame:
    """Iceberg-shaped corpus (repo, path, commit, lang, content).

    content embeds 0-5 ``import src.mXX.fYYY`` lines referencing other
    paths of the same repo — drives dependency-edge extraction (E3).
    Commits each touch 2-8 paths — drives co-commit extraction (E4).
    """
    rng = np.random.default_rng(seed)
    langs = np.array(["py", "java", "cpp", "txt"])
    lang_w = np.array([0.5, 0.2, 0.2, 0.1])
    rows = []
    for ri in range(n_repos):
        repo = f"repo{ri:03d}"
        paths = [
            f"src/m{j % 5:02d}/f{j:03d}.py" for j in range(paths_per_repo)
        ]
        path_lang = rng.choice(langs, size=paths_per_repo, p=lang_w)
        # file version history: each commit touches 2-8 paths
        touched_by: dict[str, list[str]] = {p: [] for p in paths}
        for ci in range(commits_per_repo):
            commit = f"c{ri * 1000 + ci:05d}"
            k = int(rng.integers(2, 9))
            for p in rng.choice(paths_per_repo, size=k, replace=False):
                touched_by[paths[p]].append(commit)
        for j, p in enumerate(paths):
            n_imports = int(rng.integers(0, 6))
            targets = rng.choice(paths_per_repo, size=n_imports, replace=False)
            imports = "\n".join(
                f"import src.m{t % 5:02d}.f{t:03d}" for t in targets if t != j
            )
            body = f"# {repo}/{p}\n{imports}\ndef f_{j}():\n    return {j}\n"
            commits = touched_by[p] or [f"c{ri * 1000:05d}"]
            for commit in commits:
                rows.append((repo, p, commit, str(path_lang[j]), body))
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()
