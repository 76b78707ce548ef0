"""Distributed connected components (transitive clustering).

The reference clusters its similarity graph **on the driver** with igraph
Louvain (``takco/cluster/cluster.py:74-106``) after concatenating all edges
driver-side (``takco/__init__.py:367-374``) — its scaling wall. The north
rule asks for *transitive* clustering, which is exactly connected
components, so this stage implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) as iterated hash-partitioned grouped passes over the edge Dataset
— edges never touch the driver.

- **large-star**: for each node u, link every neighbor v > u to the minimum
  of Γ(u) ∪ {u};
- **small-star**: orient edges to (hi → lo), link every neighbor (and u) to
  the minimum;
- each pass runs through :func:`groupmap.partitioned_group_map`, so the
  per-node adjacency segments are processed with ``np.minimum.reduceat`` —
  no per-group Python calls;
- converge when the edge multiset is stable (count + uint64 checksum
  aggregate — O(1) driver data per round);
- each round materializes (bounded lineage ≈ a per-round checkpoint);
  O(log n) rounds for worst-case chains, 2-3 in practice for clone clusters.

Output: ``(file_id, cluster_id)`` with ``cluster_id = min(file_id in
component)`` — the same canonical labeling the brute-force oracle uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .groupmap import partitioned_group_map, segment_boundaries

_CHECK_MIX = np.uint64(0x9E3779B97F4A7C15)


def _edge_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    return pa.table(
        {"u": pa.array(u, type=pa.int64()), "v": pa.array(v, type=pa.int64())}
    )


def _uv(batch: pa.Table) -> tuple:
    return (
        np.asarray(batch.column("u").combine_chunks(), dtype=np.int64),
        np.asarray(batch.column("v").combine_chunks(), dtype=np.int64),
    )


def _symmetrize(batch: pa.Table) -> pa.Table:
    u, v = _uv(batch)
    keep = u != v
    u, v = u[keep], v[keep]
    return _edge_table(np.concatenate([u, v]), np.concatenate([v, u]))


def _orient_down(batch: pa.Table) -> pa.Table:
    """(hi → lo) orientation for small-star; drops self-loops."""
    u, v = _uv(batch)
    keep = u != v
    u, v = u[keep], v[keep]
    return _edge_table(np.maximum(u, v), np.minimum(u, v))


def _large_star_partition(part: pa.Table) -> pa.Table:
    """All u-segments of one partition, vectorized: emit (v, m) for v > u."""
    u, v = _uv(part)
    n = len(u)
    if n == 0:
        return _edge_table(u, v)
    starts = segment_boundaries(u)  # u arrives sorted
    counts = np.diff(np.append(starts, n))
    min_v = np.minimum.reduceat(v, starts)
    m_seg = np.minimum(min_v, u[starts])
    m_row = np.repeat(m_seg, counts)
    mask = v > u
    return _edge_table(v[mask], m_row[mask])


def _small_star_partition(part: pa.Table) -> pa.Table:
    """u-segments of (hi → lo) edges: link neighbors ∪ {u} to the minimum.

    Emits (v, m) for every neighbor v ≠ m plus (u, m) per segment; local
    duplicate edges are collapsed (the multiset stabilizes at the star
    fixpoint, which the checksum detector relies on).
    """
    u, v = _uv(part)
    n = len(u)
    if n == 0:
        return _edge_table(u, v)
    starts = segment_boundaries(u)
    counts = np.diff(np.append(starts, n))
    min_v = np.minimum.reduceat(v, starts)  # v ≤ u ⇒ m = min(Γ ∪ {u}) = min_v
    m_seg = min_v
    m_row = np.repeat(m_seg, counts)
    mask = v != m_row
    out_u = np.concatenate([v[mask], u[starts]])
    out_v = np.concatenate([m_row[mask], m_seg])
    keep = out_u != out_v
    out_u, out_v = out_u[keep], out_v[keep]
    # local dedup: duplicates arise when two (u,v) rows repeat in a segment
    if len(out_u):
        order = np.lexsort((out_v, out_u))
        out_u, out_v = out_u[order], out_v[order]
        first = np.concatenate(
            [[True], (out_u[1:] != out_u[:-1]) | (out_v[1:] != out_v[:-1])]
        )
        out_u, out_v = out_u[first], out_v[first]
    return _edge_table(out_u, out_v)


def _checksum(ds) -> tuple:
    """(n_edges, uint64 checksum) — order-insensitive fixpoint detector."""

    def add_check(batch: pa.Table) -> pa.Table:
        u, v = _uv(batch)
        c = (
            u.view(np.uint64) * _CHECK_MIX + v.view(np.uint64)
            if len(u)
            else np.zeros(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "n": pa.array([len(u)], type=pa.int64()),
                "c": pa.array([int(c.sum(dtype=np.uint64))], type=pa.uint64()),
            }
        )

    parts = ds.map_batches(add_check, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    c = 0
    for p in parts:
        c = (c + int(p["c"])) % (1 << 64)
    return n, c


def star_edges(edges, max_rounds: int = 50, num_partitions: int = 64):
    """Iterate large-star/small-star to the fixpoint star forest.

    Returns the (child → root) edge Dataset; every non-root node appears
    exactly once as a child, roots only on the right side.
    """
    cur = edges.map_batches(_orient_down, batch_format="pyarrow", zero_copy_batch=True)
    cur = partitioned_group_map(cur, "u", _small_star_partition, num_partitions)
    # checksum the INITIAL small-star result too: clone/dup graphs are star
    # forests after one pass, so round 1's checksum matches immediately and
    # the loop exits after ONE large+small round instead of a confirm round
    # (2 grouped exchanges saved on the common path)
    import logging
    import time as _time

    log = logging.getLogger(__name__)
    t0 = _time.monotonic()
    cur = cur.materialize()
    prev_sig = _checksum(cur)
    log.info("cc round 0 (initial small-star): %d edges, %.1fs", prev_sig[0], _time.monotonic() - t0)
    for _round in range(max_rounds):
        t0 = _time.monotonic()
        sym = cur.map_batches(_symmetrize, batch_format="pyarrow", zero_copy_batch=True)
        large = partitioned_group_map(sym, "u", _large_star_partition, num_partitions)
        down = large.map_batches(
            _orient_down, batch_format="pyarrow", zero_copy_batch=True
        )
        small = partitioned_group_map(down, "u", _small_star_partition, num_partitions)
        cur = small.materialize()  # bounded lineage: per-round barrier
        sig = _checksum(cur)
        log.info("cc round %d: %d edges, %.1fs", _round + 1, sig[0], _time.monotonic() - t0)
        if sig == prev_sig:
            break
        prev_sig = sig
    return cur


def _vec_cc(u: np.ndarray, v: np.ndarray) -> tuple:
    """Exact in-memory CC: (nodes, root_per_node), root = min id in component.

    Min-label propagation over the two precomputed sorted edge orders
    (``reduceat`` per segment — no per-edge Python, no ``ufunc.at``) with
    double pointer-jumping per iteration → O(log n) iterations.
    """
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    a, b = inv[: len(u)], inv[len(u) :]
    keep = a != b
    a, b = a[keep], b[keep]
    label = np.arange(len(nodes), dtype=np.int64)
    if len(a) == 0:
        return nodes, nodes[label]
    order_a = np.argsort(a, kind="stable")
    a_s, b_by_a = a[order_a], b[order_a]
    starts_a = segment_boundaries(a_s)
    seg_a = a_s[starts_a]
    order_b = np.argsort(b, kind="stable")
    b_s, a_by_b = b[order_b], a[order_b]
    starts_b = segment_boundaries(b_s)
    seg_b = b_s[starts_b]
    for _ in range(64):
        new = label.copy()
        new[seg_a] = np.minimum(new[seg_a], np.minimum.reduceat(label[b_by_a], starts_a))
        new[seg_b] = np.minimum(new[seg_b], np.minimum.reduceat(label[a_by_b], starts_b))
        new = new[new]
        new = new[new]
        if np.array_equal(new, label):
            break
        label = new
    return nodes, nodes[label]


def _local_cc_partition(part: pa.Table) -> pa.Table:
    """Partition-local CONTRACTION: edges of one hash partition → that
    subgraph's star forest (child → local root), ≤ one row per local node.

    Replacing each partition's edges by a spanning star forest preserves
    global connectivity (every edge (u,v) becomes the path u→r←v) while
    cutting row count from |E_p| (with cross-band duplicates) to < |V_p|.
    """
    u, v = _uv(part)
    nodes, roots = _vec_cc(u, v)
    child = nodes != roots
    return _edge_table(nodes[child], roots[child])


def cc_forest(
    edges,
    num_partitions: int = 64,
    driver_limit: int = 5_000_000,
    max_rounds: int = 50,
):
    """Edge Dataset → star forest Dataset (child → root, root = component min).

    1. **Contract batch-locally**: a MAP pass (no exchange — it fuses into
       whatever DAG produced the edges) runs exact vectorized CC per edge
       batch; duplicate edges, rings, and intra-batch chains collapse, so
       only ≤ |V_batch| forest rows materialize.
    2. **Finish adaptively**: the contracted forest's global CC runs on the
       driver when it is small (≤ ``driver_limit`` rows ≈ 16 B each — the
       same small-side rule as every broadcast in this engine), else through
       one grouped cross-partition contraction plus the distributed
       large-star/small-star rounds (:func:`star_edges`).
       Clone-style corpora contract to ~#clustered-files rows, so the driver
       path is the common case; web-scale quotient graphs take the star path.
    """
    contracted = edges.map_batches(
        _local_cc_partition, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if contracted.count() > driver_limit:
        regrouped = partitioned_group_map(
            contracted, "u", _local_cc_partition, num_partitions
        )
        return star_edges(regrouped, max_rounds, num_partitions)
    u_parts: list = []
    v_parts: list = []
    for b in contracted.iter_batches(batch_format="pyarrow", batch_size=None):
        u_parts.append(np.asarray(b.column("u").combine_chunks(), dtype=np.int64))
        v_parts.append(np.asarray(b.column("v").combine_chunks(), dtype=np.int64))
    if not u_parts:
        return contracted
    nodes, roots = _vec_cc(np.concatenate(u_parts), np.concatenate(v_parts))
    child = nodes != roots
    import ray.data as _rd

    return _rd.from_arrow(_edge_table(nodes[child], roots[child]))


def label_rows(star):
    """Star forest → raw (file_id, cluster_id) rows — children plus
    batch-locally-deduped root self-labels. May contain cross-batch
    duplicate root rows; feed into a grouped min (or merge pass)."""

    def fn(t: pa.Table) -> pa.Table:
        u, v = _uv(t)
        roots = np.unique(v)
        return pa.table(
            {
                "file_id": pa.array(np.concatenate([u, roots]), type=pa.int64()),
                "cluster_id": pa.array(np.concatenate([v, roots]), type=pa.int64()),
            }
        )

    return star.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _min_label_partition(part: pa.Table) -> pa.Table:
    """Per-node min cluster label with numpy segments (fine-key groupby.min
    over n nodes is ~50× slower in Ray's aggregate path)."""
    fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
    cid = np.asarray(part.column("cluster_id").combine_chunks(), dtype=np.int64)
    starts = segment_boundaries(fid)
    mins = (
        np.minimum.reduceat(cid, starts) if len(fid) else np.zeros(0, dtype=np.int64)
    )
    return pa.table(
        {
            "file_id": pa.array(fid[starts], type=pa.int64()),
            "cluster_id": pa.array(mins, type=pa.int64()),
        }
    )


def connected_components(edges, max_rounds: int = 50, num_partitions: int = 64):
    """Edge Dataset (u, v[, score]) → labels Dataset (file_id, cluster_id).

    Contraction-first (:func:`cc_forest`); nodes appearing only in
    self-loops (or not at all) are absent from the output; use
    :func:`attach_singletons` for a total labeling.
    """
    raw = label_rows(cc_forest(edges, num_partitions, max_rounds=max_rounds))
    return partitioned_group_map(raw, "file_id", _min_label_partition, num_partitions)


def rechunk_clusters(labels, max_cluster_size: int, num_partitions: int = 64):
    """Split clusters larger than ``max_cluster_size`` into deterministic
    chunks — the reference caps its partitions the same way before stitching
    (``takco/__init__.py:385-397``: clusters over ``max_cluster_size`` are
    re-chunked into consecutive slices).

    Members are ordered by ``file_id`` and sliced into ⌈m/max⌉ runs; each
    run's label becomes its MINIMUM member id — the engine's canonical
    labeling, so sub-cluster ids stay collision-free int64 without a second
    id-assignment pass. Clusters at or under the cap pass through unchanged.
    One grouped pass over 16 B label rows.
    """
    if max_cluster_size < 1:
        raise ValueError("max_cluster_size must be ≥ 1")

    def split(part: pa.Table) -> pa.Table:
        cid = np.asarray(part.column("cluster_id").combine_chunks(), dtype=np.int64)
        fid = np.asarray(part.column("file_id").combine_chunks(), dtype=np.int64)
        order = np.lexsort((fid, cid))
        cid, fid = cid[order], fid[order]
        starts = segment_boundaries(cid)
        counts = np.diff(np.append(starts, len(cid)))
        # chunk index of each row within its cluster
        within = np.arange(len(cid), dtype=np.int64) - np.repeat(starts, counts)
        chunk = within // max_cluster_size
        # new label = min fid of the (cluster, chunk) run = its first row
        # (rows are fid-sorted within the cluster)
        run_first = np.concatenate(
            [[True], (cid[1:] != cid[:-1]) | (chunk[1:] != chunk[:-1])]
        ) if len(cid) else np.zeros(0, dtype=bool)
        run_starts = np.flatnonzero(run_first)
        run_counts = np.diff(np.append(run_starts, len(cid)))
        new_label = np.repeat(fid[run_starts], run_counts)
        out = part.take(pa.array(order, type=pa.int64()))
        idx = out.schema.get_field_index("cluster_id")
        return out.set_column(idx, "cluster_id", pa.array(new_label, type=pa.int64()))

    return partitioned_group_map(labels, "cluster_id", split, num_partitions)


def _tagged_cluster_edges(labels, edges, num_partitions: int, min_score=None):
    """Shared refinement core: stamp every (optionally score-filtered) edge
    with its u-side node's cluster id and co-partition by cluster — two
    grouped exchanges, nothing driver-side (see :func:`refine_clusters`).
    Returns rows (u, v, w, cluster_id, is_member), partition-sorted by
    cluster_id; member rows carry the nodes, edge rows the weights.

    The Ray-Data analog of the reference's Louvain ``edge_exp`` sharpening
    (``takco/cluster/cluster.py:74-106``), which the reference runs
    driver-side on the whole graph. Two grouped exchanges, nothing
    driver-side:

    1. group by NODE: strong edges meet their u-side label row (u and v
       share a cluster by CC construction, so tagging u's side suffices)
       — a grouped pass instead of a hash join so an all-empty strong-edge
       side (over-tight threshold) degrades to all-singletons instead of
       tripping the join operator on schemaless empty partitions;
    2. group by CLUSTER: clusters are disjoint node sets, so all edges of
       a partition feed a single :func:`_vec_cc` call.

    Refinement can only split, never merge; labels stay min-member-id
    canonical (cluster ids may be arbitrary int64, hence the explicit
    ``is_member`` flag rather than sentinel values).

    ``labels``: (file_id, cluster_id); ``edges``: (u, v, score).
    """

    def strong_rows(t: pa.Table) -> pa.Table:
        kept = t
        if min_score is not None:
            mask = pc.greater_equal(
                t.column("score").cast(pa.float64()), pa.scalar(float(min_score))
            )
            kept = t.filter(mask)
        n = kept.num_rows
        return pa.table(
            {
                "key": kept.column("u").cast(pa.int64()),
                "v": kept.column("v").cast(pa.int64()),
                "w": kept.column("score").cast(pa.float64()),
                "cluster_id": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "is_member": pa.array(np.zeros(n, dtype=bool), type=pa.bool_()),
            }
        )

    def member_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t.column("file_id").cast(pa.int64()),
                "v": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                "w": pa.array(np.zeros(n, dtype=np.float64), type=pa.float64()),
                "cluster_id": t.column("cluster_id").cast(pa.int64()),
                "is_member": pa.array(np.ones(n, dtype=bool), type=pa.bool_()),
            }
        )

    by_node = edges.map_batches(
        strong_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(labels.map_batches(member_rows, batch_format="pyarrow", zero_copy_batch=True))

    def tag_partition(t: pa.Table) -> pa.Table:
        """Sorted by node key: stamp each edge row with its node's cluster."""
        key = np.asarray(t.column("key").combine_chunks(), dtype=np.int64)
        cl = np.asarray(t.column("cluster_id").combine_chunks(), dtype=np.int64)
        mem = np.asarray(t.column("is_member").combine_chunks(), dtype=bool)
        starts = segment_boundaries(key)
        n_segs = len(starts)
        seg_id = np.repeat(
            np.arange(n_segs, dtype=np.int64), np.diff(np.append(starts, len(key)))
        )
        seg_cluster = np.zeros(n_segs, dtype=np.int64)
        seg_valid = np.zeros(n_segs, dtype=bool)
        mpos = np.flatnonzero(mem)
        seg_cluster[seg_id[mpos]] = cl[mpos]
        seg_valid[seg_id[mpos]] = True
        # edges whose u never appears in labels are dropped (shouldn't occur)
        keep = mem | seg_valid[seg_id]
        out = t.filter(pa.array(keep))
        stamped = np.where(mem, cl, seg_cluster[seg_id])[keep]
        return pa.table(
            {
                "u": out.column("key"),
                "v": out.column("v"),
                "w": out.column("w"),
                "cluster_id": pa.array(stamped, type=pa.int64()),
                "is_member": out.column("is_member"),
            }
        )

    return partitioned_group_map(by_node, "key", tag_partition, num_partitions)


def refine_clusters(labels, edges, min_score: float, num_partitions: int = 64):
    """Score-weighted cluster sharpening: within each transitive cluster,
    re-run CC over only STRONG edges (``score >= min_score``); members held
    together only by weak near-threshold chains split apart.

    The Ray-Data analog of the reference's Louvain ``edge_exp`` sharpening
    (``takco/cluster/cluster.py:74-106``), which the reference runs
    driver-side on the whole graph. Refinement can only split, never merge;
    labels stay min-member-id canonical. See also
    :func:`refine_clusters_modularity` for the density-sensitive variant.

    ``labels``: (file_id, cluster_id); ``edges``: (u, v, score).
    """
    tagged = _tagged_cluster_edges(labels, edges, num_partitions, min_score=min_score)

    def per_partition(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("u").combine_chunks(), dtype=np.int64)
        v = np.asarray(t.column("v").combine_chunks(), dtype=np.int64)
        mem = np.asarray(t.column("is_member").combine_chunks(), dtype=bool)
        # label inputs may carry duplicate root rows — dedup membership
        members = np.unique(u[mem])
        nodes, roots = _vec_cc(u[~mem], v[~mem])
        pos = np.searchsorted(nodes, members) if len(nodes) else np.zeros(len(members), dtype=np.int64)
        pos = np.minimum(pos, max(len(nodes) - 1, 0))
        found = nodes[pos] == members if len(nodes) else np.zeros(len(members), dtype=bool)
        new_label = np.where(found, roots[pos] if len(nodes) else 0, members)
        return pa.table(
            {
                "file_id": pa.array(members, type=pa.int64()),
                "cluster_id": pa.array(new_label, type=pa.int64()),
            }
        )

    return partitioned_group_map(tagged, "cluster_id", per_partition, num_partitions)


def _louvain_one_level(
    members: np.ndarray,
    eu: np.ndarray,
    ev: np.ndarray,
    ew: np.ndarray,
    resolution: float = 1.0,
    max_sweeps: int = 10,
) -> np.ndarray:
    """One Louvain level (Blondel et al. 2008, phase 1) on a small weighted
    graph — deterministic: nodes sweep in ascending id order, gain ties
    break to the smallest community id. Returns the community index per
    member (aligned with the SORTED ``members`` array)."""
    nodes = members  # sorted unique
    n = len(nodes)
    iu = np.searchsorted(nodes, eu)
    iv = np.searchsorted(nodes, ev)
    w = np.maximum(np.asarray(ew, dtype=np.float64), 0.0)
    # undirected CSR (each edge in both directions)
    src = np.concatenate([iu, iv])
    dst = np.concatenate([iv, iu])
    wgt = np.concatenate([w, w])
    order = np.argsort(src, kind="stable")
    src, dst, wgt = src[order], dst[order], wgt[order]
    indptr = np.concatenate([[0], np.cumsum(np.bincount(src, minlength=n))]).astype(
        np.int64
    )
    deg = np.bincount(src, weights=wgt, minlength=n)
    two_m = float(wgt.sum())
    comm = np.arange(n, dtype=np.int64)
    if two_m <= 0:
        return comm
    comm_tot = deg.copy()
    for _ in range(max_sweeps):
        moved = False
        for i in range(n):
            lo, hi = indptr[i], indptr[i + 1]
            if lo == hi:
                continue
            ci = comm[i]
            comm_tot[ci] -= deg[i]
            # self-loops stay with the node wherever it goes: they count in
            # deg/two_m but must not tally as links to the node's own
            # community (they'd bias staying; they appear once aggregation
            # levels condense intra-community mass)
            nb = dst[lo:hi] != i
            if not nb.any():
                comm_tot[ci] += deg[i]
                continue
            cs = comm[dst[lo:hi][nb]]
            uc, inv = np.unique(cs, return_inverse=True)
            kin = np.bincount(inv, weights=wgt[lo:hi][nb])
            gains = kin - resolution * deg[i] * comm_tot[uc] / two_m
            stay_pos = np.searchsorted(uc, ci)
            stay = (
                gains[stay_pos]
                if stay_pos < len(uc) and uc[stay_pos] == ci
                else -resolution * deg[i] * comm_tot[ci] / two_m
            )
            best = int(np.flatnonzero(gains == gains.max())[0])  # uc sorted asc
            if gains[best] > stay + 1e-12:
                comm[i] = uc[best]
                moved = True
            comm_tot[comm[i]] += deg[i]
        if not moved:
            break
    return comm


def _louvain_multilevel(
    members: np.ndarray,
    eu: np.ndarray,
    ev: np.ndarray,
    ew: np.ndarray,
    resolution: float = 1.0,
    max_levels: int = 16,
) -> np.ndarray:
    """Full multi-level Louvain (Blondel et al. 2008; the reference's igraph
    ``community_multilevel``, ``takco/cluster/cluster.py:74-106``): repeat
    (phase 1 local moves → phase 2 graph aggregation) until a level makes no
    merge. Aggregation lets whole communities move as units, escaping the
    over-fragmented local optima single-level node moves get stuck in
    (e.g. heavy inter-community bridges freeze phase 1 at size-2
    fragments). Deterministic like :func:`_louvain_one_level`. Returns the
    community index per member (aligned with sorted ``members``)."""
    n = len(members)
    assign = np.arange(n, dtype=np.int64)  # original node → current community
    # current level graph in index space
    gu = np.searchsorted(members, eu).astype(np.int64)
    gv = np.searchsorted(members, ev).astype(np.int64)
    gw = np.maximum(np.asarray(ew, dtype=np.float64), 0.0)
    cur_n = n
    for _ in range(max_levels):
        comm = _louvain_one_level(
            np.arange(cur_n, dtype=np.int64), gu, gv, gw, resolution=resolution
        )
        uc, comp = np.unique(comm, return_inverse=True)
        if len(uc) == cur_n:  # no merge this level → local optimum
            break
        assign = comp[assign]
        # phase 2: condense communities into super-nodes; parallel edges sum,
        # intra-community mass becomes self-loops (kept: they weight degrees
        # and two_m at the next level)
        cu, cv = comp[gu], comp[gv]
        key = cu * len(uc) + cv
        uk, inv = np.unique(key, return_inverse=True)
        gw = np.bincount(inv, weights=gw, minlength=len(uk))
        gu, gv = (uk // len(uc)).astype(np.int64), (uk % len(uc)).astype(np.int64)
        cur_n = len(uc)
    return assign


def refine_clusters_modularity(
    labels,
    edges,
    num_partitions: int = 64,
    resolution: float = 1.0,
    min_refine_size: int = 3,
    levels: int = 1,
):
    """Density-sensitive cluster sharpening: within each transitive cluster,
    one level of weighted-modularity optimization (Louvain phase 1) over ALL
    the cluster's edges — the reference's actual Louvain step
    (``takco/cluster/cluster.py:74-106``), not just a score cut. Splits a
    cluster whose members form two dense communities joined by a sparse
    bridge even when every edge clears the score threshold (the case
    :func:`refine_clusters` provably cannot split).

    Distribution shape is identical to :func:`refine_clusters` (two grouped
    exchanges); the per-cluster kernel is a Python sweep, which is fine
    because clusters are small by construction (CC + ``max_cluster_size``
    capping) — the partitioning assumption is max cluster size ≪ partition
    size. Clusters with < ``min_refine_size`` members pass through
    untouched. Refinement only splits, never merges; labels stay
    min-member-id canonical.

    ``levels`` > 1 runs full multi-level Louvain
    (:func:`_louvain_multilevel`, the reference's igraph
    ``community_multilevel``): each level condenses communities into
    super-nodes and re-optimizes, letting whole fragments move as units —
    single-level node moves can freeze in over-fragmented local optima
    (e.g. heavy bridges pin phase 1 at size-2 fragments) that aggregation
    escapes.

    ``labels``: (file_id, cluster_id); ``edges``: (u, v, score).
    """
    tagged = _tagged_cluster_edges(labels, edges, num_partitions, min_score=None)

    def per_partition(t: pa.Table) -> pa.Table:
        u = np.asarray(t.column("u").combine_chunks(), dtype=np.int64)
        v = np.asarray(t.column("v").combine_chunks(), dtype=np.int64)
        w = np.asarray(t.column("w").combine_chunks(), dtype=np.float64)
        cl = np.asarray(t.column("cluster_id").combine_chunks(), dtype=np.int64)
        mem = np.asarray(t.column("is_member").combine_chunks(), dtype=bool)
        starts = segment_boundaries(cl)  # partition arrives sorted by cluster
        ends = np.append(starts[1:], len(cl))
        out_f: list = []
        out_c: list = []
        for s, e in zip(starts, ends):
            m = mem[s:e]
            members = np.unique(u[s:e][m])
            if len(members) == 0:
                continue
            em = ~m
            eu, ev_, ew = u[s:e][em], v[s:e][em], w[s:e][em]
            if len(members) < min_refine_size or len(eu) == 0:
                out_f.append(members)
                out_c.append(np.full(len(members), cl[s], dtype=np.int64))
                continue
            if levels > 1:
                comm = _louvain_multilevel(
                    members, eu, ev_, ew, resolution=resolution, max_levels=levels
                )
            else:
                comm = _louvain_one_level(members, eu, ev_, ew, resolution=resolution)
            # canonical label: min member id per community
            order = np.argsort(comm, kind="stable")
            cstarts = segment_boundaries(comm[order])
            mins = np.minimum.reduceat(members[order], cstarts)
            lab_of_comm = np.zeros(comm.max() + 1, dtype=np.int64)
            lab_of_comm[comm[order][cstarts]] = mins
            out_f.append(members)
            out_c.append(lab_of_comm[comm])
        if not out_f:
            return pa.table(
                {
                    "file_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "file_id": pa.array(np.concatenate(out_f), type=pa.int64()),
                "cluster_id": pa.array(np.concatenate(out_c), type=pa.int64()),
            }
        )

    return partitioned_group_map(tagged, "cluster_id", per_partition, num_partitions)


def attach_singletons(labels, all_ids):
    """labels ∪ (id, id) for ids absent from any edge → total labeling.

    ``all_ids``: Dataset with a ``file_id`` column. Equivalent to the
    reference's identity-edge union (``takco/__init__.py:367-370``) but as a
    groupby-min instead of a driver concat.
    """
    self_labels = all_ids.map_batches(
        lambda t: pa.table(
            {
                "file_id": t.column("file_id").cast(pa.int64()),
                "cluster_id": t.column("file_id").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partitioned_group_map(
        labels.union(self_labels), "file_id", _min_label_partition, 64
    )


def cluster_manifest(
    labels,
    signals=None,
    label_column: str = "cluster_id",
    id_column: str = "file_id",
    signal_id_column: str = "id",
    quality_column: str = "quality_u",
    source_column: str | None = None,
    sample_size: int = 8,
    num_partitions: int | None = None,
):
    """One row PER CLUSTER: size, rep_id, a deterministic member sample,
    quality range, distinct-source count — the audit/merge artifact of the
    reference's cluster merge step (``takco/cluster/cluster.py:532-649``),
    which walks clusters driver-side; here it is ONE grouped exchange with
    a fully vectorized segment kernel.

    Output columns: ``cluster_id``, ``size``, ``rep_id`` (best
    ``quality_column`` member, ties by min id, when ``signals`` is given;
    min member id otherwise), ``members_sample`` (ascending member ids,
    capped at ``sample_size``) — plus ``quality_min``/``quality_max`` when
    ``signals`` is given and ``n_sources`` when ``source_column`` names a
    column of ``labels`` (provenance spread). Write via the ``write_shards``
    sink for resumable sharded output.

    ``labels``: (id_column, label_column[, source_column]);
    ``signals``: optional (signal_id_column, quality_column) int64 signal.
    """
    from .groupmap import partitioned_group_map, segment_boundaries

    parts = num_partitions
    if parts is None:
        from ..util import default_join_partitions

        parts = default_join_partitions()

    cols = [id_column, label_column] + ([source_column] if source_column else [])
    ds = labels.select_columns(cols)
    if signals is not None:
        from ..util import join_remote_args

        ds = ds.join(
            signals.select_columns([signal_id_column, quality_column]),
            join_type="inner",
            num_partitions=parts,
            on=(id_column,),
            right_on=(signal_id_column,),
            aggregator_ray_remote_args=join_remote_args(parts),
        )

    has_quality = signals is not None

    def per_partition(t: pa.Table) -> pa.Table:
        cl = np.asarray(t.column(label_column).combine_chunks(), dtype=np.int64)
        ids = np.asarray(t.column(id_column).combine_chunks(), dtype=np.int64)
        order = np.lexsort((ids, cl))
        cl_s, ids_s = cl[order], ids[order]
        starts = segment_boundaries(cl_s)
        ends = np.append(starts[1:], len(cl_s))
        size = ends - starts
        # deterministic ascending-id member sample, one flat gather
        cap = np.minimum(size, sample_size)
        total = int(cap.sum())
        base = np.repeat(starts, cap)
        cum0 = np.concatenate([[0], np.cumsum(cap)[:-1]]).astype(np.int64)
        intra = np.arange(total, dtype=np.int64) - np.repeat(cum0, cap)
        offsets = np.concatenate([[0], np.cumsum(cap)]).astype(np.int64)
        sample = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            pa.array(ids_s[base + intra], type=pa.int64()),
        )
        out = {
            "cluster_id": pa.array(cl_s[starts], type=pa.int64()),
            "size": pa.array(size.astype(np.int64), type=pa.int64()),
        }
        if has_quality:
            q = np.asarray(t.column(quality_column).combine_chunks(), dtype=np.int64)
            # rep = best quality, ties by min id: first of each segment
            # under the (cluster, -q, id) order
            order2 = np.lexsort((ids, -q, cl))
            starts2 = segment_boundaries(cl[order2])
            out["rep_id"] = pa.array(ids[order2][starts2], type=pa.int64())
            q_s = q[order]
            out["quality_min"] = pa.array(
                np.minimum.reduceat(q_s, starts), type=pa.int64()
            )
            out["quality_max"] = pa.array(
                np.maximum.reduceat(q_s, starts), type=pa.int64()
            )
        else:
            out["rep_id"] = pa.array(ids_s[starts], type=pa.int64())
        out["members_sample"] = sample
        if source_column:
            src = t.column(source_column).combine_chunks()
            codes = (
                pc.fill_null(pc.dictionary_encode(src).indices, -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            o3 = np.lexsort((codes, cl))
            cl3, cd3 = cl[o3], codes[o3]
            first = (
                np.concatenate([[True], (cl3[1:] != cl3[:-1]) | (cd3[1:] != cd3[:-1])])
                if len(cl3)
                else np.zeros(0, dtype=bool)
            )
            starts3 = segment_boundaries(cl3)
            out["n_sources"] = pa.array(
                np.add.reduceat(first.astype(np.int64), starts3), type=pa.int64()
            )
        return pa.table(out)

    return partitioned_group_map(ds, label_column, per_partition, parts)
