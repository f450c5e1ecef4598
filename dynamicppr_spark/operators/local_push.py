"""Broadcast-CSR local push — the reference-parity fast path (mode='bcsr').

guowentian/dynamicppr (PVLDB'17; checkout absent, SURVEY.md §0) is a
single-node engine: the whole CSR lives in RAM and each PPR query/update
pushes at memory speed. For graphs whose CSR fits in executor memory this
module mirrors that design Spark-natively:

  - the CSR arrays are torrent-BROADCAST once per graph version (tens of
    MB for millions of edges) — every executor gets the reference's
    in-memory layout,
  - PPR state is grouped BY SOURCE and each source's forward push runs as
    a vectorized numpy sweep loop inside ``applyInPandas`` — per-source
    parallelism across executors is exactly the reference's parallel
    query model (K8 batched sources), and the sweep itself is the same
    synchronous push as the distributed superstep path and tests/oracle.py,
  - per update batch, the driver patches its numpy edge set (O(E) array
    ops), rebroadcasts, and precomputes the K2 invariant-restoration
    adjustment as a COO template (u_pos, t_pos, coef) with
    ``dr[t] = coef * pi_old[u]`` plus per-u reserve rescale factors — the
    kernel applies it fully vectorized, then re-pushes. One Spark job per
    batch instead of a dozen.

SIZE GATE: this path holds one copy of the graph on the driver and one per
executor. ``fits_local(graph)`` gates it (default ~32M edges ≈ 0.5 GB);
beyond the gate PPREngine falls back to the distributed DataFrame scatter
supersteps — the 100 TB path. The two paths implement identical semantics
(gated by the same oracle/metamorphic tests).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class LocalCSR:
    """In-memory CSR over a MONOTONE vertex universe (never shrinks across
    updates, mirroring LinkGraph.vertices): ``vids`` sorted unique vertex
    ids; vertices without out-edges have empty indptr slices (dangling)."""

    vids: np.ndarray     # int64, sorted
    indptr: np.ndarray   # int64, len(vids)+1
    dst_pos: np.ndarray  # int32/int64 positions into vids
    w: np.ndarray | None  # float64 edge weights (None = unweighted)
    wout: np.ndarray     # float64 out-weight sums (0.0 = dangling)

    @property
    def n(self) -> int:
        return len(self.vids)

    @property
    def n_edges(self) -> int:
        return len(self.dst_pos)

    def pos_of(self, v: np.ndarray) -> np.ndarray:
        """Positions of vertex ids in the universe; -1 when absent."""
        p = np.searchsorted(self.vids, v)
        p = np.minimum(p, self.n - 1) if self.n else np.zeros_like(p)
        ok = self.n > 0
        hit = (self.vids[p] == v) if ok else np.zeros(len(v), dtype=bool)
        return np.where(hit, p, -1)


def build_local_csr(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray | None = None,
    universe: np.ndarray | None = None,
    presorted: bool = False,
) -> LocalCSR:
    """CSR from parallel edge arrays. ``universe`` (sorted unique vids)
    may extend beyond the edge endpoints (isolated vertices).
    ``presorted``: caller guarantees rows already sorted by (src, dst) —
    skips the O(E log E) lexsort (vids are sorted, so id order == position
    order)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    ends = np.union1d(src, dst) if len(src) else np.empty(0, np.int64)
    vids = ends if universe is None else np.union1d(universe, ends)
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    if presorted:
        ww = None if w is None else np.asarray(w, dtype=np.float64)
    else:
        order = np.lexsort((di, si))
        si, di = si[order], di[order]
        ww = None if w is None else np.asarray(w, dtype=np.float64)[order]
    counts = np.bincount(si, minlength=len(vids))
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    if ww is None:
        wout = counts.astype(np.float64)
    else:
        wout = np.bincount(si, weights=ww, minlength=len(vids))
    return LocalCSR(vids=vids, indptr=indptr, dst_pos=di, w=ww, wout=wout)


def csr_from_graph(graph, max_edges: int | None = None) -> LocalCSR:
    """Collect a LinkGraph's edges into a LocalCSR (Arrow toPandas — one
    O(E) transfer per graph version, gated by ``max_edges``)."""
    if max_edges is not None and graph.num_edges > max_edges:
        raise ValueError(
            f"graph has {graph.num_edges} edges > local gate {max_edges}; "
            "use the distributed mode"
        )
    cols = ["src", "dst"] + (["w"] if graph.weighted else [])
    pdf = graph.edges.select(*cols).toPandas()
    vdf = graph.vertices.toPandas()
    return build_local_csr(
        pdf["src"].to_numpy(),
        pdf["dst"].to_numpy(),
        pdf["w"].to_numpy() if graph.weighted else None,
        universe=np.unique(vdf["vid"].to_numpy(dtype=np.int64)),
    )


def apply_batch_local(
    csr: LocalCSR, ops: list[str], bsrc: np.ndarray, bdst: np.ndarray,
    bw: np.ndarray | None = None,
) -> LocalCSR:
    """New LocalCSR after one update batch — same semantics as
    LinkGraph.with_updates: new edges = (old \\ batch pairs) ∪ inserts;
    the vertex universe grows by the batch endpoints and never shrinks."""
    bsrc = np.asarray(bsrc, dtype=np.int64)
    bdst = np.asarray(bdst, dtype=np.int64)
    keep = bsrc != bdst
    ops = np.asarray(ops)[keep]
    bsrc, bdst = bsrc[keep], bdst[keep]
    bw_arr = (
        np.ones(len(bsrc)) if bw is None else np.asarray(bw, dtype=np.float64)[keep]
    )
    # old edges as id pairs (already sorted by (src, dst) positions)
    osrc = csr.vids[np.repeat(np.arange(csr.n), np.diff(csr.indptr))]
    odst = csr.vids[csr.dst_pos]
    ow = csr.w

    # pair membership: pack (src, dst) into one int64 when ids allow
    # (src*2^32 + dst, exact for 0 <= id < 2^31) — np.isin on a packed
    # int64 with a tiny test set is ~40x faster than a structured view
    max_id = max(
        int(csr.vids.max()) if csr.n else 0,
        int(bsrc.max()) if len(bsrc) else 0,
        int(bdst.max()) if len(bdst) else 0,
    )
    min_id = min(
        int(csr.vids.min()) if csr.n else 0,
        int(bsrc.min()) if len(bsrc) else 0,
        int(bdst.min()) if len(bdst) else 0,
    )
    ins_mask = ops == "+"
    # duplicate '+' of the same pair in one batch: deterministic, order-free
    # rule = keep the MAX weight (LinkGraph.with_updates applies the same
    # rule, so df and bcsr modes produce identical edge weights)
    s_i, d_i, w_i = bsrc[ins_mask], bdst[ins_mask], bw_arr[ins_mask]
    order = np.lexsort((w_i, d_i, s_i))
    s2, d2 = s_i[order], d_i[order]
    if len(s2):
        grp_last = np.r_[(s2[1:] != s2[:-1]) | (d2[1:] != d2[:-1]), True]
        sel = order[np.nonzero(grp_last)[0]]
    else:
        sel = order
    isrc, idst, iw = s_i[sel], d_i[sel], w_i[sel]
    if 0 <= min_id and max_id < 2**31:
        pack = lambda s, d: (s << np.int64(32)) | d  # noqa: E731
        old_keys = pack(osrc, odst)
        batch_keys = np.unique(pack(bsrc, bdst))
        removed_mask = np.isin(old_keys, batch_keys)
    else:  # arbitrary int64 ids: structured row view (slower, still exact)
        view = lambda a: a.view([("s", np.int64), ("d", np.int64)]).reshape(-1)  # noqa: E731
        old_pairs = np.ascontiguousarray(np.stack([osrc, odst], axis=1))
        batch_pairs = np.ascontiguousarray(
            np.unique(np.stack([bsrc, bdst], axis=1), axis=0)
        )
        removed_mask = np.isin(view(old_pairs), view(batch_pairs))
    ksrc, kdst = osrc[~removed_mask], odst[~removed_mask]
    kw = None if ow is None else ow[~removed_mask]
    universe = np.union1d(csr.vids, np.union1d(bsrc, bdst))
    # kept edges preserve the old (src, dst) sort; merge the few sorted
    # inserts at their positions with np.insert — no O(E log E) re-sort
    io = np.lexsort((idst, isrc))
    isrc, idst, iw = isrc[io], idst[io], iw[io]
    if 0 <= min_id and max_id < 2**31:
        kk = (ksrc << np.int64(32)) | kdst
        ik = (isrc << np.int64(32)) | idst
        pos = np.searchsorted(kk, ik)
        nsrc = np.insert(ksrc, pos, isrc)
        ndst = np.insert(kdst, pos, idst)
        if ow is None and bw is None:
            nw = None
        else:
            nw = np.insert(np.ones(len(ksrc)) if kw is None else kw, pos, iw)
        return build_local_csr(nsrc, ndst, nw, universe=universe, presorted=True)
    nsrc = np.concatenate([ksrc, isrc])
    ndst = np.concatenate([kdst, idst])
    if ow is None and bw is None:
        nw = None
    else:
        nw = np.concatenate([np.ones(len(ksrc)) if kw is None else kw, iw])
    return build_local_csr(nsrc, ndst, nw, universe=universe)


@dataclass
class AdjustmentPlan:
    """K2 invariant restoration as vectorized templates over NEW-CSR
    positions: dr[t_pos] += coef * pi_old[u_pos]; pi[r_u] *= factor.
    Derivation in operators/ppr.py module docstring."""

    u_pos: np.ndarray    # per dr term
    t_pos: np.ndarray
    coef: np.ndarray
    ru_pos: np.ndarray   # per rescale term
    factor: np.ndarray


def _flat_slices(indptr: np.ndarray, us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Flat edge indices for the given row positions: returns
    (u_repeated, flat_edge_idx) — pure numpy, no per-row Python."""
    starts, ends = indptr[us], indptr[us + 1]
    cnt = ends - starts
    total = int(cnt.sum())
    if not total:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    off = np.repeat(np.cumsum(cnt) - cnt, cnt)
    flat = np.arange(total) - off + np.repeat(starts, cnt)
    return np.repeat(us, cnt), flat


def build_adjustment(
    old: LocalCSR, new: LocalCSR, alpha: float,
    touched_vids: np.ndarray | None = None,
) -> AdjustmentPlan:
    """Adjustment templates for every vertex whose out-neighborhood
    changed between ``old`` and ``new`` (positions in NEW universe —
    which contains the old universe by construction).

    ``touched_vids`` (the batch's src ids) bounds the scan to O(|batch|)
    candidate vertices; adjacency is keyed by src, so only batch srcs can
    have changed. Without it every vertex is compared.

    FULLY VECTORIZED (round-3): per-candidate neighborhoods are flattened
    into packed (u_pos << 32 | t_pos) key arrays and the signed weight sum
    per key gives the per-edge weight delta dw — changed pairs are exactly
    dw != 0 (identical float cancellation to the old exact array compare).
    Normal-case coefs are c*dw/d_old in one shot; dangling transitions
    (rare) emit their full old/new contribution rows from the same flat
    slices. No per-changed-vertex Python loop: a 10^5-row batch builds in
    well under a second on the driver (the round-2 bottleneck of the bcsr
    path at large batch sizes). Positions are dense (< 2^31 — a driver
    array bound long before the shift packing overflows).

    Parity with the per-vertex reference formulation is pinned by
    tests/test_round3_fixes.py against ``_build_adjustment_loop``."""
    c = (1.0 - alpha) / alpha
    old_to_new = new.pos_of(old.vids)
    assert (old_to_new >= 0).all(), "universe must be monotone"
    d_old_by_new = np.zeros(new.n)
    d_old_by_new[old_to_new] = old.wout
    d_new = new.wout
    old_pos_of_new = np.full(new.n, -1, dtype=np.int64)
    old_pos_of_new[old_to_new] = np.arange(old.n)

    if touched_vids is not None:
        cand = new.pos_of(np.unique(np.asarray(touched_vids, np.int64)))
        cand = cand[cand >= 0]
    else:
        cand = np.arange(new.n, dtype=np.int64)
    d_o_c = d_old_by_new[cand]
    d_n_c = d_new[cand]
    normal = cand[(d_o_c > 0.0) & (d_n_c > 0.0)]
    trans = cand[
        ((d_o_c == 0.0) | (d_n_c == 0.0)) & ((d_o_c > 0.0) | (d_n_c > 0.0))
    ]

    def old_flat(us):
        """(u_pos_in_new, t_pos_in_new, w) over old out-edges of us."""
        uo = old_pos_of_new[us]
        u_rep, flat = _flat_slices(old.indptr, uo)
        # map repeated old u positions back to new positions
        t = old_to_new[old.dst_pos[flat]]
        w = old.w[flat] if old.w is not None else np.ones(len(flat))
        u_new = old_to_new[u_rep] if len(u_rep) else u_rep
        return u_new, t, w

    def new_flat(us):
        u_rep, flat = _flat_slices(new.indptr, us)
        t = new.dst_pos[flat]
        w = new.w[flat] if new.w is not None else np.ones(len(flat))
        return u_rep, t, w

    U_parts, T_parts, C_parts = [], [], []
    RU = np.empty(0, np.int64)
    FA = np.empty(0, np.float64)

    # ---- normal case: signed weight sum per (u, t) key = dw
    if len(normal):
        has_old = old_pos_of_new[normal] >= 0
        u1, t1, w1 = old_flat(normal[has_old])
        u2, t2, w2 = new_flat(normal)
        keys = np.concatenate(
            [(u1 << np.int64(32)) | t1, (u2 << np.int64(32)) | t2]
        )
        wts = np.concatenate([-w1, w2])
        if len(keys):
            order = np.argsort(keys, kind="stable")
            ks, ws = keys[order], wts[order]
            grp = np.r_[0, np.nonzero(ks[1:] != ks[:-1])[0] + 1]
            dw = np.add.reduceat(ws, grp)
            ku = ks[grp] >> np.int64(32)
            kt = ks[grp] & np.int64(0xFFFFFFFF)
            nz = dw != 0.0
            ku, kt, dw = ku[nz], kt[nz], dw[nz]
            U_parts.append(ku)
            T_parts.append(kt)
            C_parts.append(c * dw / d_old_by_new[ku])
            changed_u = np.unique(ku)
            if len(changed_u):
                d_o_u = d_old_by_new[changed_u]
                d_n_u = d_new[changed_u]
                U_parts.append(changed_u)
                T_parts.append(changed_u)
                C_parts.append(-(d_n_u - d_o_u) / (d_o_u * alpha))
                RU = changed_u
                FA = d_n_u / d_o_u

    # ---- dangling transitions: full old/new contribution rows
    if len(trans):
        d_o_t = d_old_by_new[trans]
        d_n_t = d_new[trans]
        t_old_out = trans[d_o_t > 0.0]
        if len(t_old_out):
            u1, t1, w1 = old_flat(t_old_out)
            U_parts.append(u1)
            T_parts.append(t1)
            C_parts.append(-c * w1 / d_old_by_new[u1])
        t_old_dang = trans[d_o_t == 0.0]
        if len(t_old_dang):
            U_parts.append(t_old_dang)
            T_parts.append(t_old_dang)
            C_parts.append(np.full(len(t_old_dang), -c))
        t_new_out = trans[d_n_t > 0.0]
        if len(t_new_out):
            u2, t2, w2 = new_flat(t_new_out)
            U_parts.append(u2)
            T_parts.append(t2)
            C_parts.append(c * w2 / d_new[u2])
        t_new_dang = trans[d_n_t == 0.0]
        if len(t_new_dang):
            U_parts.append(t_new_dang)
            T_parts.append(t_new_dang)
            C_parts.append(np.full(len(t_new_dang), c))

    cat = lambda ps, dt: (  # noqa: E731
        np.concatenate(ps).astype(dt) if ps else np.empty(0, dt)
    )
    return AdjustmentPlan(
        u_pos=cat(U_parts, np.int64),
        t_pos=cat(T_parts, np.int64),
        coef=cat(C_parts, np.float64),
        ru_pos=RU.astype(np.int64),
        factor=FA.astype(np.float64),
    )


def _build_adjustment_loop(
    old: LocalCSR, new: LocalCSR, alpha: float,
    touched_vids: np.ndarray | None = None,
) -> AdjustmentPlan:
    """Per-changed-vertex reference formulation of ``build_adjustment``
    (the round-2 implementation) — kept as the parity oracle for the
    vectorized version; test/diagnostic use only."""
    c = (1.0 - alpha) / alpha
    # map old universe into new positions
    old_to_new = new.pos_of(old.vids)
    assert (old_to_new >= 0).all(), "universe must be monotone"
    d_old_by_new = np.zeros(new.n)
    d_old_by_new[old_to_new] = old.wout
    d_new = new.wout

    # per-vertex out-neighbor (t_pos_in_new, w) sets
    def nbrs_old(u_old_pos):
        s, e = old.indptr[u_old_pos], old.indptr[u_old_pos + 1]
        t = old_to_new[old.dst_pos[s:e]]
        w = old.w[s:e] if old.w is not None else np.ones(e - s)
        return t, w

    def nbrs_new(u_new_pos):
        s, e = new.indptr[u_new_pos], new.indptr[u_new_pos + 1]
        t = new.dst_pos[s:e]
        w = new.w[s:e] if new.w is not None else np.ones(e - s)
        return t, w

    # candidate changed vertices: batch srcs when known, else all
    changed = []
    old_pos_of_new = np.full(new.n, -1, dtype=np.int64)
    old_pos_of_new[old_to_new] = np.arange(old.n)
    if touched_vids is not None:
        cand_pos = new.pos_of(np.unique(np.asarray(touched_vids, np.int64)))
        candidates = cand_pos[cand_pos >= 0].tolist()
    else:
        candidates = range(new.n)
    for u in candidates:
        uo = old_pos_of_new[u]
        if uo < 0:
            if new.indptr[u + 1] > new.indptr[u]:
                changed.append(u)
            continue
        tn, wn = nbrs_new(u)
        to, wo = nbrs_old(uo)
        if len(tn) != len(to) or not np.array_equal(tn, to) or not np.array_equal(wn, wo):
            changed.append(u)
    U, T, C = [], [], []
    RU, FA = [], []
    for u in changed:
        uo = old_pos_of_new[u]
        d_o = float(d_old_by_new[u])
        d_n = float(d_new[u])
        tn, wn = nbrs_new(u)
        to, wo = (nbrs_old(uo) if uo >= 0 else (np.empty(0, np.int64), np.empty(0)))
        if d_o > 0.0 and d_n > 0.0:
            # normal: only changed edges at old denominator + self term
            # weight-changed pairs contribute (w_new - w_old) * c / d_o
            both = np.intersect1d(tn, to)
            w_new_map = dict(zip(tn.tolist(), wn.tolist()))
            w_old_map = dict(zip(to.tolist(), wo.tolist()))
            add_t = np.setdiff1d(tn, to)
            rem_t = np.setdiff1d(to, tn)
            for t in add_t:
                U.append(u); T.append(int(t)); C.append(c * w_new_map[int(t)] / d_o)
            for t in rem_t:
                U.append(u); T.append(int(t)); C.append(-c * w_old_map[int(t)] / d_o)
            for t in both:
                dw = w_new_map[int(t)] - w_old_map[int(t)]
                if dw != 0.0:
                    U.append(u); T.append(int(t)); C.append(c * dw / d_o)
            U.append(u); T.append(u); C.append(-(d_n - d_o) / (d_o * alpha))
            RU.append(u); FA.append(d_n / d_o)
        else:
            # dangling transition: full recompute of u's contribution row
            if d_o > 0.0:
                for t, w in zip(to.tolist(), wo.tolist()):
                    U.append(u); T.append(int(t)); C.append(-c * w / d_o)
            else:
                U.append(u); T.append(u); C.append(-c)
            if d_n > 0.0:
                for t, w in zip(tn.tolist(), wn.tolist()):
                    U.append(u); T.append(int(t)); C.append(c * w / d_n)
            else:
                U.append(u); T.append(u); C.append(c)
    return AdjustmentPlan(
        u_pos=np.asarray(U, dtype=np.int64),
        t_pos=np.asarray(T, dtype=np.int64),
        coef=np.asarray(C, dtype=np.float64),
        ru_pos=np.asarray(RU, dtype=np.int64),
        factor=np.asarray(FA, dtype=np.float64),
    )


def push_sweeps(
    csr: LocalCSR,
    r: np.ndarray,
    pi: np.ndarray,
    extra_r: np.ndarray,
    extra_pi: np.ndarray,
    alpha: float,
    eps: float,
    max_iters: int,
) -> int:
    """Synchronous forward-push sweeps until L1(|r|) <= eps (same
    semantics as the distributed superstep and tests/oracle.py::ppr_push:
    absorb alpha*r everywhere, scatter (1-alpha)*r*w/wout along
    out-edges, dangling mass self-loops). ``extra_*`` are state vertices
    outside the universe (isolated sources): no in- or out-edges, pure
    self-loop dynamics. Mutates arrays in place; returns sweeps run."""
    n = csr.n
    has_out = csr.wout > 0.0
    dangling = ~has_out
    # full-edge sweep precomputation: per-edge source position and push
    # fraction (w/wout); dense frontiers then need only two gathers and a
    # bincount per sweep, with no index construction
    src_per_edge = np.repeat(np.arange(n), np.diff(csr.indptr))
    if csr.w is None:
        counts = np.diff(csr.indptr).astype(np.float64)
        inv_wout = np.zeros(n)
        inv_wout[has_out] = 1.0 / counts[has_out]
    else:
        inv_wout = np.zeros(n)
        inv_wout[has_out] = 1.0 / csr.wout[has_out]
    frac_per_edge = (
        inv_wout[src_per_edge] if csr.w is None else csr.w * inv_wout[src_per_edge]
    )
    it = 0
    while it < max_iters:
        l1 = float(np.abs(r).sum() + np.abs(extra_r).sum())
        if l1 <= eps:  # eps == 0: stops only at exact emptiness
            break
        it += 1
        push = r
        pi += alpha * push
        extra_pi += alpha * extra_r
        active = np.nonzero(push)[0]
        if len(active) * 16 >= n:
            # dense frontier: one full-edge sweep (gather, scale, bincount —
            # bincount is ~an order of magnitude faster than np.add.at)
            contrib = (1.0 - alpha) * push[src_per_edge] * frac_per_edge
            new_r = np.bincount(csr.dst_pos, weights=contrib, minlength=n)
            dang_push = push * dangling
            new_r += (1.0 - alpha) * dang_push
        else:
            # sparse frontier: slice only the active vertices' edge ranges
            new_r = np.zeros_like(r)
            act_out = active[has_out[active]]
            act_dang = active[dangling[active]]
            if len(act_out):
                starts = csr.indptr[act_out]
                ends = csr.indptr[act_out + 1]
                cnt = ends - starts
                total = int(cnt.sum())
                if total:
                    offsets = np.repeat(np.cumsum(cnt) - cnt, cnt)
                    flat = np.arange(total) - offsets + np.repeat(starts, cnt)
                    tpos = csr.dst_pos[flat]
                    contrib = (
                        np.repeat((1.0 - alpha) * push[act_out], cnt)
                        * frac_per_edge[flat]
                    )
                    new_r += np.bincount(tpos, weights=contrib, minlength=n)
            if len(act_dang):
                new_r[act_dang] += (1.0 - alpha) * push[act_dang]
        r[:] = new_r
        extra_r *= 1.0 - alpha
    return it


def make_push_kernel(
    bc_csr, alpha: float, eps: float, max_iters: int, bc_adjust=None,
    iter_accum=None, l1_accum=None,
):
    """applyInPandas kernel factory: one group = one source's full state.

    ``bc_csr``: broadcast LocalCSR; ``bc_adjust``: optional broadcast
    AdjustmentPlan applied (vectorized) before pushing — the K2 path.
    ``iter_accum``: optional accumulator collecting sweep counts;
    ``l1_accum``: optional MAX accumulator fed each source's final
    ||r||_1 — per-source convergence evidence for the driver."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        csr: LocalCSR = bc_csr.value
        vids_state = pdf["vid"].to_numpy(dtype=np.int64)
        pos = csr.pos_of(vids_state)
        inside = pos >= 0
        r = np.zeros(csr.n)
        pi = np.zeros(csr.n)
        np.add.at(r, pos[inside], pdf["residual"].to_numpy()[inside])
        np.add.at(pi, pos[inside], pdf["reserve"].to_numpy()[inside])
        extra_vids = vids_state[~inside]
        extra_r = pdf["residual"].to_numpy()[~inside].astype(np.float64).copy()
        extra_pi = pdf["reserve"].to_numpy()[~inside].astype(np.float64).copy()
        if bc_adjust is not None:
            adj: AdjustmentPlan = bc_adjust.value
            if len(adj.u_pos):
                p_old = pi[adj.u_pos]
                np.add.at(r, adj.t_pos, adj.coef * p_old)
            if len(adj.ru_pos):
                pi[adj.ru_pos] *= adj.factor
        sweeps = push_sweeps(csr, r, pi, extra_r, extra_pi, alpha, eps, max_iters)
        if iter_accum is not None:
            iter_accum.add(int(sweeps))
        if l1_accum is not None:
            l1_accum.add(float(np.abs(r).sum() + np.abs(extra_r).sum()))
        keep = (r != 0.0) | (pi != 0.0)
        kp = np.nonzero(keep)[0]
        ekeep = (extra_r != 0.0) | (extra_pi != 0.0)
        source = int(pdf["source"].iloc[0])
        return pd.DataFrame(
            {
                "source": np.full(len(kp) + int(ekeep.sum()), source, np.int64),
                "vid": np.concatenate([csr.vids[kp], extra_vids[ekeep]]),
                "residual": np.concatenate([r[kp], extra_r[ekeep]]),
                "reserve": np.concatenate([pi[kp], extra_pi[ekeep]]),
            }
        )

    return kernel
