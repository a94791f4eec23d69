"""On-device IVF (inverted-file) approximate index.

The exact sweep is the right default up to a few million rows per chip
(ARCHITECTURE.md: 0.9–2.8 ms at 1M). Beyond that — or under sub-millisecond
latency budgets — IVF trades exactness for a ~nlist/nprobe reduction in HBM
traffic, mirroring the reference's Milvus configuration semantically
(IVF_FLAT, nlist=1024, COSINE, nprobe=10; reference
ImageEmbeddingSystem.py:56-61, image_search.py:88).

TPU-native formulation (everything static-shape, one jit per (nprobe, k)):
  build:  device k-means over unit rows (deterministic seeded init),
          rows re-packed CONTIGUOUSLY by cluster into a padded
          (nlist, Lmax, D) tensor — probing a cluster is a slab read,
          not a random gather.
  search: query x centroids (tiny matmul) -> top-nprobe clusters ->
          take nprobe slabs -> fused cosine + masked top-k -> original ids.

Exactness note: recall is tunable via nprobe; the reference's own ANN had
the same property. The exact index remains the default everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("nlist", "iters"))
def _kmeans_unit(rows: jnp.ndarray, seed: jnp.ndarray, nlist: int, iters: int = 10):
    """Spherical k-means over unit rows -> (nlist, D) unit centroids."""
    n, d = rows.shape
    key = jax.random.PRNGKey(seed[0])
    init_idx = jax.random.choice(key, n, (nlist,), replace=False)
    centroids = rows[init_idx]

    def step(c, _):
        sims = jnp.dot(rows, c.T, preferred_element_type=jnp.float32)  # (N, C)
        assign = jnp.argmax(sims, axis=1)
        onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)  # (N, C)
        sums = jnp.dot(onehot.T, rows, preferred_element_type=jnp.float32)
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        new = jnp.where(norms > 1e-9, sums / jnp.maximum(norms, 1e-9), c)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    sims = jnp.dot(rows, centroids.T, preferred_element_type=jnp.float32)
    return centroids, jnp.argmax(sims, axis=1)


@functools.partial(jax.jit, static_argnames=("r",))
def _top_r_centroids(rows: jnp.ndarray, centroids: jnp.ndarray, r: int):
    """Top-r centroid ids per row (module-level jit: rebuilds reuse the
    compiled kernel instead of retracing a per-call lambda)."""
    sims = jnp.dot(rows, centroids.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, r)[1]


@functools.partial(jax.jit, static_argnames=("iters",))
def _kmeans_chunked(rows3: jnp.ndarray, centroids: jnp.ndarray, iters: int):
    """Spherical k-means Lloyd iterations with CHUNKED accumulation.

    rows3: (nchunks, chunk, D) training rows; centroids: (C, D) init.
    The full (N, C) one-hot never materializes — each chunk contributes a
    (C, D) partial sum, bounding transient memory to chunk*C f32. This is
    what makes 8M-row builds possible (the unchunked formulation needs
    N*C*4 bytes: 8M x 8192 = 256 GB)."""
    nlist = centroids.shape[0]

    def step(c, _):
        def chunk_step(sums, rc):
            sims = jnp.dot(rc, c.T, preferred_element_type=jnp.float32)
            oh = jax.nn.one_hot(jnp.argmax(sims, axis=1), nlist,
                                dtype=jnp.float32)
            return sums + jnp.dot(oh.T, rc,
                                  preferred_element_type=jnp.float32), None

        sums, _ = jax.lax.scan(
            chunk_step, jnp.zeros((nlist, rows3.shape[-1]), jnp.float32), rows3
        )
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        return jnp.where(norms > 1e-9, sums / jnp.maximum(norms, 1e-9), c), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@functools.partial(jax.jit, static_argnames=("k",))
def _tail_sweep(queries: jnp.ndarray, tail: jnp.ndarray,
                scales: jnp.ndarray, valid: jnp.ndarray, k: int):
    """Exact cosine top-k over the incremental-insert tail buffer.

    The tail is padded to a doubling capacity (one compile per doubling,
    not per insert); `valid` masks empty slots. int8 tails ride the same
    bf16-dot + per-row-scale formulation as the packed slabs."""
    q = queries.astype(jnp.float32)
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    qu = jnp.where(qn > 0, q / jnp.where(qn > 0, qn, 1.0), 0.0)
    if tail.dtype == jnp.int8:
        s = jax.lax.dot_general(
            qu.astype(jnp.bfloat16), tail.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scales[None, :]
    else:
        s = jax.lax.dot_general(
            qu, tail, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s = jnp.where(valid[None, :], s, -jnp.inf)
    return jax.lax.top_k(s, k)


def _unit_queries(queries: jnp.ndarray) -> jnp.ndarray:
    q = queries.astype(jnp.float32)
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(qn > 0, q / jnp.where(qn > 0, qn, 1.0), 0.0)


def _score_probed(qu, probe, packed_flat, ids_flat, lmax, k, scales_flat):
    """Shared scoring body: per-query top-k over its probed cluster slabs.

    `probe` holds cluster positions INTO packed_flat (global cluster ids for
    the resident path; gather-local positions for the offloaded path)."""

    def per_query(args):
        qv, clusters = args

        # Each probed cluster is ONE contiguous dynamic slice — XLA's batched
        # slab gather (packed[clusters]) compiled ~100x slower on TPU.
        def probe_one(_, c):
            slab = jax.lax.dynamic_slice_in_dim(packed_flat, c * lmax, lmax, 0)
            ids = jax.lax.dynamic_slice_in_dim(ids_flat, c * lmax, lmax, 0)
            if scales_flat is not None:
                # int8 slabs: bf16 dot, per-row scale applied to the output
                sc = jax.lax.dynamic_slice_in_dim(scales_flat, c * lmax, lmax, 0)
                s = jnp.dot(slab.astype(jnp.bfloat16), qv.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * sc
            else:
                s = jnp.dot(slab.astype(jnp.float32), qv,
                            preferred_element_type=jnp.float32)
            return None, (s, ids)

        _, (scores, ids) = jax.lax.scan(probe_one, None, clusters)
        scores = scores.reshape(-1)
        ids = ids.reshape(-1)
        scores = jnp.where(ids >= 0, scores, -jnp.inf)
        vals, local = jax.lax.top_k(scores, k)
        return vals, ids[local]

    # lax.map (not vmap): one query's probed slabs live at a time, bounding
    # probe memory to (Lmax, D) per step (a 1M-row gallery with Q=32 vmapped
    # would otherwise OOM HBM).
    return jax.lax.map(per_query, (qu, probe))


@functools.partial(jax.jit, static_argnames=("lmax", "nprobe", "k"))
def _ivf_search(
    queries: jnp.ndarray,      # (Q, D)
    centroids: jnp.ndarray,    # (C, D) unit
    packed_flat: jnp.ndarray,  # (C*Lmax, D) rows, cluster-contiguous (f32|int8)
    ids_flat: jnp.ndarray,     # (C*Lmax,) original ids (-1 padding)
    lmax: int,
    nprobe: int,
    k: int,
    scales_flat: Optional[jnp.ndarray] = None,  # (C*Lmax,) int8 mode
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qu = _unit_queries(queries)
    csims = jnp.dot(qu, centroids.T, preferred_element_type=jnp.float32)  # (Q, C)
    _, probe = jax.lax.top_k(csims, nprobe)  # (Q, nprobe)
    return _score_probed(qu, probe, packed_flat, ids_flat, lmax, k, scales_flat)


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _probe_ids(queries: jnp.ndarray, centroids: jnp.ndarray, nprobe: int):
    """Top-nprobe cluster ids per query (offloaded path, device-resident
    centroids; the slab gather happens host-side)."""
    qu = _unit_queries(queries)
    csims = jnp.dot(qu, centroids.T, preferred_element_type=jnp.float32)
    return qu, jax.lax.top_k(csims, nprobe)[1]


@functools.partial(jax.jit, static_argnames=("lmax", "k"))
def _score_gathered(
    qu: jnp.ndarray,           # (Q, D) unit queries
    probe_local: jnp.ndarray,  # (Q, nprobe) positions into the GATHERED slabs
    packed_flat: jnp.ndarray,  # (U*Lmax, D) gathered slabs
    ids_flat: jnp.ndarray,     # (U*Lmax,)
    lmax: int,
    k: int,
    scales_flat: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return _score_probed(qu, probe_local, packed_flat, ids_flat, lmax, k,
                         scales_flat)


@functools.partial(
    jax.jit,
    static_argnames=("lmax", "nprobe", "k", "mesh", "axis", "nlist_real"),
)
def sharded_ivf_search(
    queries: jnp.ndarray,      # (Q, D) replicated
    centroids: jnp.ndarray,    # (C, D) replicated (tiny)
    packed_flat: jnp.ndarray,  # (C*Lmax, D) sharded over `axis` (cluster-major)
    ids_flat: jnp.ndarray,     # (C*Lmax,) sharded over `axis`
    lmax: int,
    nprobe: int,
    k: int,
    scales_flat: Optional[jnp.ndarray] = None,  # (C*Lmax,) sharded; int8 mode
    *,
    mesh,
    axis: str = "data",
    nlist_real: Optional[int] = None,  # mask padded clusters >= this id
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip IVF: clusters sharded over the mesh.

    Every device computes the (replicated) centroid top-nprobe, then probes
    only the clusters IT owns (masked contiguous slices on its local shard);
    per-device top-k results merge over ICI exactly like the exact index
    (k-sized all_gather). Wall-clock per query is the slowest device's owned
    probes — ~nprobe/ndev slabs with a balanced assignment. int8 slab shards
    (with their per-slot `scales_flat` sharded alongside) ride the same bf16
    MXU dot + output-scale formulation as the single-chip `_ivf_search`."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = mesh.shape[axis]
    nlist = centroids.shape[0]
    if nlist % ndev != 0:
        # The ownership math below AND the caller's row sharding of the
        # (nlist*lmax, D) packed array both assume cluster boundaries align
        # with shard boundaries; a non-divisible nlist makes trailing
        # clusters unreachable and mis-addresses every shard >= 1 —
        # silently wrong results. Pad nlist (empty clusters, ids=-1) to a
        # multiple of the axis size before sharding, or pick a divisible
        # nlist in IVFIndex.build.
        raise ValueError(
            f"sharded_ivf_search requires nlist ({nlist}) divisible by the "
            f"'{axis}' mesh axis size ({ndev})"
        )
    clusters_per_dev = nlist // ndev

    def local(q, c, pf, idf, sf):
        dev = jax.lax.axis_index(axis)
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        qu = jnp.where(qn > 0, q / jnp.where(qn > 0, qn, 1.0), 0.0)
        csims = jnp.dot(qu, c.T, preferred_element_type=jnp.float32)
        if nlist_real is not None and nlist_real < nlist:
            # clusters past nlist_real are divisibility padding (empty
            # slabs, ids=-1): keep the probe budget on real clusters
            csims = jnp.where(
                jnp.arange(nlist)[None, :] < nlist_real, csims, -jnp.inf
            )
        _, probe = jax.lax.top_k(csims, nprobe)  # (Q, nprobe) global ids

        def per_query(args):
            qv, clusters = args

            def probe_one(_, cid):
                local_cid = cid - dev * clusters_per_dev
                owned = jnp.logical_and(local_cid >= 0, local_cid < clusters_per_dev)
                safe = jnp.clip(local_cid, 0, clusters_per_dev - 1)
                slab = jax.lax.dynamic_slice_in_dim(pf, safe * lmax, lmax, 0)
                ids = jax.lax.dynamic_slice_in_dim(idf, safe * lmax, lmax, 0)
                if sf is not None:
                    sc = jax.lax.dynamic_slice_in_dim(sf, safe * lmax, lmax, 0)
                    s = jnp.dot(slab.astype(jnp.bfloat16),
                                qv.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) * sc
                else:
                    s = jnp.dot(slab.astype(jnp.float32), qv,
                                preferred_element_type=jnp.float32)
                s = jnp.where(jnp.logical_and(owned, ids >= 0), s, -jnp.inf)
                return None, (s, ids)

            _, (scores, ids) = jax.lax.scan(probe_one, None, clusters)
            vals, local_top = jax.lax.top_k(scores.reshape(-1), k)
            return vals, ids.reshape(-1)[local_top]

        vals, ids = jax.lax.map(per_query, (qu, probe))  # (Q, k) per device
        all_vals = jax.lax.all_gather(vals, axis, axis=-1, tiled=True)
        all_ids = jax.lax.all_gather(ids, axis, axis=-1, tiled=True)
        order = jnp.argsort(-all_vals, axis=-1, stable=True)[..., :k]
        return (
            jnp.take_along_axis(all_vals, order, axis=-1),
            jnp.take_along_axis(all_ids, order, axis=-1),
        )

    if scales_flat is None:
        fn = shard_map(
            lambda q, c, pf, idf: local(q, c, pf, idf, None),
            mesh=mesh,
            in_specs=(P(), P(), P(axis, None), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(queries, centroids, packed_flat, ids_flat)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, centroids, packed_flat, ids_flat, scales_flat)


def recommended_ivf(n_rows: int) -> Optional[Tuple[int, int]]:
    """Measured-curve operating point: (nlist, nprobe), or None for exact.

    Grounded in the captured curves (bench_results/ivf8m_probe.json,
    bench_results/ivf_curve.json; tables in ARCHITECTURE.md):
      * below a few million rows the exact int8 sweep is already sub-ms and
        bit-faithful — IVF buys nothing (1M exact: 0.90 ms single query,
        ~0.02 ms/query batched);
      * at 8M clustered rows, nlist=4096 / nprobe=8 measured recall@10 0.958
        at 0.088 ms/query — 5.1x faster than the exact 8M sweep
        (0.445 ms/query batched) scanning 0.3% of the gallery;
      * on UNCLUSTERED (i.i.d.) rows recall collapses (0.35 @ nprobe=10 at
        1M) — no operating point helps; callers with adversarially
        unstructured data should stay exact regardless of scale.

    nlist scales as ~2*sqrt(N) floored to a power of two (8M -> 4096,
    32M -> 8192), keeping mean cluster size — and so per-probe slab cost —
    growing only as sqrt(N). nprobe=8 is the measured knee: recall plateaus
    (0.958 -> 0.960 from nprobe 8 -> 64) because the residual loss is
    balance-cap spill, not probe shortfall.
    """
    if n_rows < (4 << 20):
        return None
    nlist = 1 << int(np.floor(np.log2(2.0 * np.sqrt(float(n_rows)))))
    return int(np.clip(nlist, 1024, 16384)), 8


def _rebalance_assign(
    unit: np.ndarray, centroids: np.ndarray, assign: np.ndarray, cap: int,
    chunk: int = 65536, rows: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Greedy capacity-capped reassignment: rows of over-full clusters move
    to their best centroid with free capacity, least-confident rows first.
    Host-side, chunked — neither the (N, C) similarity matrix NOR any
    O(N, D) gathered copy ever materializes (at 16M multi-assigned entries
    the unchunked `unit[rows]` / `centroids[assign]` gathers were 32 GB
    EACH and OOM-killed the 8M replicas=2 build).

    rows: optional map from assignment entries to `unit` row indices
    (multi-assignment passes each row once per replica)."""
    nlist = centroids.shape[0]
    counts = np.bincount(assign, minlength=nlist)
    if counts.max() <= cap:
        return assign
    assign = assign.copy()
    nm = len(assign)
    if rows is None:
        rows = np.arange(nm)
    # confidence = similarity to the assigned centroid — computed only for
    # members of OVER-FULL clusters (the only entries that can spill); the
    # all-entries form was a full-gallery host pass per build (r5 review)
    over = np.flatnonzero(counts > cap)
    over_mask = np.isin(assign, over)
    cand = np.flatnonzero(over_mask)
    conf = np.empty(nm, np.float32)  # read only at `cand` positions
    for i in range(0, len(cand), 1 << 20):
        sl = cand[i: i + (1 << 20)]
        conf[sl] = np.einsum(
            "nd,nd->n", unit[rows[sl]], centroids[assign[sl]]
        )
    overflow_rows = []
    for c in over:
        members = np.flatnonzero(assign == c)
        order = members[np.argsort(conf[members])]  # least confident first
        spill = order[: counts[c] - cap]
        overflow_rows.append(spill)
        assign[spill] = -1
        counts[c] = cap
    overflow = np.concatenate(overflow_rows)
    free = cap - counts  # per-cluster remaining capacity
    for i in range(0, len(overflow), chunk):
        ent = overflow[i : i + chunk]
        sims = unit[rows[ent]] @ centroids.T  # (chunk, C)
        # full argsort of (chunk, C) is the hot host cost; almost every
        # spilled row lands within its top few centroids, so try a small
        # partial head first and only argsort the stragglers
        head = min(8, nlist)
        prefs_head = np.argpartition(-sims, head - 1, axis=1)[:, :head]
        hs = np.take_along_axis(sims, prefs_head, axis=1)
        prefs_head = np.take_along_axis(
            prefs_head, np.argsort(-hs, axis=1), axis=1
        )
        for j, e in enumerate(ent):
            placed = False
            for c in prefs_head[j]:
                if free[c] > 0:
                    assign[e] = int(c)
                    free[c] -= 1
                    placed = True
                    break
            if not placed:
                for c in np.argsort(-sims[j]):
                    if free[c] > 0:
                        assign[e] = int(c)
                        free[c] -= 1
                        break
    assert (assign >= 0).all()
    return assign


class IVFIndex:
    """Approximate cosine index over unit vectors (built from raw or from a
    ShardedVectorIndex's stored rows)."""

    def __init__(self, nlist: int = 1024, nprobe: int = 10, seed: int = 0,
                 dtype: str = "float32"):
        self.nlist = nlist
        self.nprobe = nprobe
        self.seed = seed
        self.dtype = dtype  # "float32" | "int8" (4x less probe HBM traffic)
        self.paths: list = []
        # exact O(1) default-paths tracking for save(): True while every
        # path was auto-generated str(row) — materializing the comparison
        # list at 32M rows costs GBs of transient host RAM (r5 review)
        self._custom_paths = False
        self._centroids = None
        self._packed = None
        self._row_ids = None
        self._scales = None
        self._replicas = 1
        self.count = 0
        # incremental-insert tail (host mirrors; device buffer padded to a
        # doubling capacity so compiles are O(log inserts))
        self._tail_rows = None   # (T, D) host, dtype-matched to packed
        self._tail_scales = None
        self._tail_n = 0
        # mesh serving (attach_mesh): search() delegates to the cluster-
        # sharded path; the callable re-derives lazily after each rebuild
        self._mesh = None
        self._mesh_axis = "data"
        self._sharded_fn = None
        # offloaded (beyond-HBM) serving: slabs live in host RAM; search
        # gathers only the PROBED slabs to the device per query batch
        self._offloaded = False
        self._host_packed = None
        self._host_ids = None
        self._host_slab_scales = None

    def build(self, embeddings: np.ndarray, paths: Optional[Sequence[str]] = None,
              iters: int = 10, balance: Optional[float] = 1.5,
              replicas: int = 1, train_size: Optional[int] = None,
              assign_chunk: int = 131072, offload: bool = False) -> "IVFIndex":
        """balance: cluster-size cap as a multiple of the mean (None = raw
        k-means assignment). Capping bounds Lmax — memory is
        nlist * Lmax * D, and every probe pays Lmax — at a small recall
        cost for points pushed to their second-best centroid.

        replicas: assign each row to its `replicas` nearest lists (multi-
        assignment). Boundary rows — the dominant recall loss on unclustered
        data — become findable from either side, at `replicas`x memory and
        Lmax. Measured at 1M x 512 unclustered, nlist=1024
        (bench_results/ivf_curve.json): recall@10 at nprobe=10 goes
        0.35 -> 0.52 with replicas=2; at EQUAL HBM work (lmax doubles, so
        compare single-assignment nprobe=20: 0.50) the gain is ~2 points
        plus half the probe-loop steps per query. Search dedups
        multi-assigned rows.

        train_size: k-means trains on a random subsample of this many rows
        (chunked Lloyd accumulation, _kmeans_chunked) and assignment runs
        chunked over the full set — required above a few million rows,
        where the full-set formulation exceeds HBM (the FAISS train/add
        split, matching the reference's Milvus IVF_FLAT which also trains
        server-side on the inserted data; ImageEmbeddingSystem.py:56-61)."""
        self._sharded_fn = None  # slabs change; re-shard lazily on search
        # a rebuild lands on-device; call offload() again to re-offload
        self._offloaded = False
        self._host_packed = self._host_ids = self._host_slab_scales = None
        emb = np.asarray(embeddings, np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        if abs(float(norms.max(initial=1.0)) - 1.0) < 1e-5 and (
            abs(float(norms.min(initial=1.0)) - 1.0) < 1e-5
        ):
            # already unit rows (the common case: index-stored galleries) —
            # skip the division COPY, which at 8M x 512 is 16 GB of host
            # RAM the big builds can't spare
            unit = emb
        else:
            unit = emb / np.where(norms > 0, norms, 1.0)
        n, d = unit.shape
        # a (re)build defines the full row set; any incremental tail from a
        # previous generation is superseded (callers pass ALL rows)
        self._tail_rows = self._tail_scales = None
        self._tail_n = 0
        nlist = min(self.nlist, n)
        replicas = max(1, min(replicas, nlist))
        if train_size is not None and train_size < n:
            rng = np.random.default_rng(self.seed)
            sel = np.sort(rng.choice(n, size=train_size, replace=False))
            chunk = min(32768, train_size)
            nchunks = max(train_size // chunk, 1)
            train = unit[sel][: nchunks * chunk].reshape(nchunks, chunk, d)
            init = train.reshape(-1, d)[
                rng.choice(nchunks * chunk, size=nlist, replace=False)
            ]
            centroids = _kmeans_chunked(
                jnp.asarray(train), jnp.asarray(init), iters
            )
            assign = np.empty(n, np.int32)
            for i in range(0, n, assign_chunk):
                assign[i : i + assign_chunk] = np.asarray(
                    _top_r_centroids(
                        jnp.asarray(unit[i : i + assign_chunk]), centroids, 1
                    )
                )[:, 0]
        else:
            centroids, assign = _kmeans_unit(
                jnp.asarray(unit), jnp.asarray([self.seed], jnp.uint32),
                nlist, iters,
            )
            assign = np.asarray(assign)
        if replicas > 1:
            # memberships = each row's top-`replicas` centroids, computed in
            # row chunks on device (the full (N, C) sims never materialize)
            tops = np.empty((n, replicas), np.int32)
            chunk = 131072
            for i in range(0, n, chunk):
                tops[i : i + chunk] = np.asarray(
                    _top_r_centroids(
                        jnp.asarray(unit[i : i + chunk]), centroids, replicas
                    )
                )
            tops[:, 0] = assign  # keep the (possibly rebalanced) primary
            m_rows = np.repeat(np.arange(n, dtype=np.int64), replicas)
            m_assign = tops.reshape(-1).astype(np.int64)
        else:
            m_rows = np.arange(n, dtype=np.int64)
            m_assign = assign.astype(np.int64)
        if balance is not None and nlist > 1:
            m_assign = _rebalance_assign(
                unit, np.asarray(centroids), m_assign.astype(np.int64),
                cap=int(np.ceil(balance * len(m_rows) / nlist)),
                rows=m_rows,
            )
        nm = len(m_rows)
        counts = np.bincount(m_assign, minlength=nlist)
        lmax = int(counts.max())
        # vectorized packing: stable sort by cluster, slot = rank within
        # cluster (position minus the cluster's start offset). All scatters
        # run CHUNKED over flat destination indices — and for int8, rows
        # quantize BEFORE packing: the old pack-f32-then-quantize order
        # materialized a (slots, D) f32 tensor (51 GB at 8M replicas=2 —
        # host-OOM) where int8-first peaks at a quarter of that.
        order = np.argsort(m_assign, kind="stable")
        sorted_assign = m_assign[order]
        starts = np.zeros(nlist, np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        dest = (np.arange(nm) - starts[sorted_assign]) + sorted_assign * lmax
        src = m_rows[order]
        self._replicas = replicas
        self._centroids = jnp.asarray(np.asarray(centroids))
        # canonical device layout is flat + cluster-contiguous (an in-jit
        # reshape of a multi-GB tensor materializes a copy -> HBM OOM)
        self._lmax = lmax
        row_ids = np.full(nlist * lmax, -1, np.int32)
        row_ids[dest] = src.astype(np.int32)
        step = 1 << 20
        if self.dtype == "int8":
            # per-source-row grid scales (identical values to the old
            # per-packed-slot computation — packing only copies rows)
            sc_row = np.empty(n, np.float32)
            q8 = np.empty((n, d), np.int8)
            for i in range(0, n, step):
                sl = slice(i, min(i + step, n))
                am = np.maximum(np.abs(unit[sl]).max(axis=1), 1e-12)
                sc_row[sl] = am / 127.0
                q8[sl] = np.clip(
                    np.rint(unit[sl] / sc_row[sl, None]), -127, 127
                ).astype(np.int8)
            flat8 = np.zeros((nlist * lmax, d), np.int8)
            sc_flat = np.zeros(nlist * lmax, np.float32)
            for i in range(0, nm, step):
                sl = slice(i, min(i + step, nm))
                flat8[dest[sl]] = q8[src[sl]]
                sc_flat[dest[sl]] = sc_row[src[sl]]
            del q8
            if offload:
                # beyond-HBM build: slabs never touch the device (a
                # device-put here would OOM at exactly the sizes offload
                # exists for — r5 review); state mirrors offload()
                self._host_packed, self._host_slab_scales = flat8, sc_flat
            else:
                self._packed = jnp.asarray(flat8)
                self._scales = jnp.asarray(sc_flat)
        else:
            flat = np.zeros((nlist * lmax, d), np.float32)
            for i in range(0, nm, step):
                sl = slice(i, min(i + step, nm))
                flat[dest[sl]] = unit[src[sl]]
            if offload:
                self._host_packed, self._host_slab_scales = flat, None
            else:
                self._packed = jnp.asarray(flat)
                self._scales = None
        if offload:
            self._host_ids = row_ids
            self._packed = self._row_ids = self._scales = None
            self._offloaded = True
            self._sharded_fn = None
        else:
            self._row_ids = jnp.asarray(row_ids)
        self.paths = list(paths) if paths is not None else [str(i) for i in range(n)]
        self._custom_paths = paths is not None
        self.count = n
        self.nlist = nlist
        return self

    def add(self, embeddings: np.ndarray,
            paths: Optional[Sequence[str]] = None) -> int:
        """Incremental insert WITHOUT a rebuild (the Milvus insert-after-
        create_index shape, reference ImageEmbeddingSystem.py:136-137).

        New rows land in a tail buffer swept EXACTLY at search time and
        merged with the probed candidates — recall for tail rows is 1.0,
        and the added latency is one small masked matmul (the device tail
        buffer doubles in capacity, so growth costs O(log inserts)
        compiles). When the tail outgrows ~10% of the packed gallery
        (`needs_rebuild`), rebuild to restore the nlist/nprobe cost model.
        Returns ids assigned to the new rows (build-order, contiguous)."""
        if self._packed is None and not self._offloaded:
            # without a packed gallery, search() would crash deep inside
            # the probe path (no _lmax/_centroids) — fail at the API edge
            raise ValueError(
                "add() before build(): build (or load/from_index) the "
                "packed index first; add() is for incremental growth of a "
                "built index"
            )
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim == 1:
            emb = emb[None]
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / np.where(norms > 0, norms, 1.0)
        n_new, d = unit.shape
        if self.dtype == "int8":
            am = np.maximum(np.abs(unit).max(axis=1), 1e-12)
            sc = (am / 127.0).astype(np.float32)
            rows = np.clip(np.rint(unit / sc[:, None]), -127, 127).astype(
                np.int8
            )
        else:
            rows, sc = unit.astype(np.float32), np.ones(n_new, np.float32)
        if self._tail_rows is None:
            self._tail_rows = rows
            self._tail_scales = sc
        else:
            self._tail_rows = np.concatenate([self._tail_rows[: self._tail_n],
                                              rows])
            self._tail_scales = np.concatenate(
                [self._tail_scales[: self._tail_n], sc])
        self._tail_n = len(self._tail_rows)
        first = self.count
        self.paths.extend(
            list(paths) if paths is not None
            else [str(first + i) for i in range(n_new)]
        )
        if paths is not None:
            self._custom_paths = True
        self.count += n_new
        return first

    @property
    def tail_count(self) -> int:
        return self._tail_n

    @property
    def needs_rebuild(self) -> bool:
        """True when the exactly-swept tail exceeds ~10% of the packed rows —
        past that the tail sweep starts to dominate the probed-slab cost and
        a rebuild restores the nlist/nprobe model."""
        packed_rows = self.count - self._tail_n
        return self._tail_n > max(packed_rows // 10, 1024)

    def _tail_topk(self, q: np.ndarray, k: int):
        """(vals, ids) over the tail buffer, padded to a doubling capacity."""
        cap = 1 << max(12, int(np.ceil(np.log2(self._tail_n))))
        rows = self._tail_rows
        sc = self._tail_scales
        if cap > self._tail_n:
            pad = cap - self._tail_n
            rows = np.concatenate([rows, np.zeros((pad, rows.shape[1]),
                                                  rows.dtype)])
            sc = np.concatenate([sc, np.ones(pad, np.float32)])
        valid = np.arange(cap) < self._tail_n
        kk = min(k, self._tail_n)
        vals, local = _tail_sweep(jnp.asarray(q), jnp.asarray(rows),
                                  jnp.asarray(sc), jnp.asarray(valid),
                                  min(k, cap))
        base = self.count - self._tail_n
        ids = np.asarray(local) + base
        return np.asarray(vals)[:, :kk], ids[:, :kk]

    def save(self, path: str) -> None:
        """Persist the built index (uncompressed npz — an 8M int8 build is
        ~6.4 GB of slabs and ~35 min of k-means; reloading takes seconds).
        Paths are stored only when informative (not the default 0..N-1)."""
        if self._packed is None and not self._offloaded:
            raise ValueError("save() before build()")
        arrays = dict(
            centroids=np.asarray(self._centroids),
            packed=self._host_packed if self._offloaded
            else np.asarray(self._packed),
            row_ids=self._host_ids if self._offloaded
            else np.asarray(self._row_ids),
            meta=np.array([self.nlist, self.nprobe, self.seed, self._lmax,
                           self._replicas, self.count, self._tail_n,
                           int(self._offloaded)],
                          np.int64),
            dtype=np.array(self.dtype),
        )
        if self._offloaded:
            if self._host_slab_scales is not None:
                arrays["scales"] = self._host_slab_scales
        elif self._scales is not None:
            arrays["scales"] = np.asarray(self._scales)
        if self._tail_n:
            arrays["tail_rows"] = self._tail_rows[: self._tail_n]
            arrays["tail_scales"] = self._tail_scales[: self._tail_n]
        if self._custom_paths:
            arrays["paths"] = np.array(self.paths)
        np.savez(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with np.load(path, allow_pickle=False) as z:
            meta = [int(v) for v in z["meta"]]
            nlist, nprobe, seed, lmax, replicas, count, tail_n = meta[:7]
            # 8th slot (absent in pre-r3 saves): the beyond-HBM flag — an
            # index saved while offloaded must come back offloaded, or
            # load() would device-put slabs that exceed HBM by construction
            offloaded = bool(meta[7]) if len(meta) > 7 else False
            ivf = cls(nlist=nlist, nprobe=nprobe, seed=seed,
                      dtype=str(z["dtype"]))
            ivf._centroids = jnp.asarray(z["centroids"])
            if offloaded:
                ivf._host_packed = z["packed"]
                ivf._host_ids = z["row_ids"]
                ivf._host_slab_scales = (z["scales"]
                                         if "scales" in z.files else None)
                ivf._offloaded = True
            else:
                ivf._packed = jnp.asarray(z["packed"])
                ivf._row_ids = jnp.asarray(z["row_ids"])
                ivf._scales = (jnp.asarray(z["scales"])
                               if "scales" in z.files else None)
            ivf._lmax = lmax
            ivf._replicas = replicas
            ivf.count = count
            if tail_n:
                ivf._tail_rows = z["tail_rows"]
                ivf._tail_scales = z["tail_scales"]
                ivf._tail_n = tail_n
            ivf.paths = (
                [str(p) for p in z["paths"]] if "paths" in z.files
                else [str(i) for i in range(count)]
            )
            ivf._custom_paths = "paths" in z.files
        return ivf

    @classmethod
    def from_index(cls, index, nlist: int = 1024, nprobe: int = 10, seed: int = 0,
                   dtype: Optional[str] = None, **build_kwargs):
        """Build from a ShardedVectorIndex's stored unit rows.

        Tombstoned (deleted) rows are excluded, and returned ids are remapped
        to INDEX row order, so `index.paths[id]` is always correct and the
        exact and ANN paths agree on deleted content.

        dtype: probe-slab storage; defaults to the base index's choice (an
        int8 exact index gets an int8 IVF — 4x less probe traffic, and the
        8M capture shows no recall cost vs its own int8 ground truth).
        build_kwargs forward to build() (replicas, train_size, balance, ...);
        train_size defaults to a 512k subsample above 1M rows — the measured
        8M build path (full-set k-means exceeds HBM there)."""
        live = np.flatnonzero(index._host_valid[: index.count])
        rows = index._host_gallery[live].astype(np.float32)
        if index._quantized:
            rows = rows * index._host_scales[live, None]
        if dtype is None:
            dtype = "int8" if index._quantized else "float32"
        if len(rows) > (1 << 20):
            build_kwargs.setdefault("train_size", 512 << 10)
        ivf = cls(nlist=nlist, nprobe=nprobe, seed=seed, dtype=dtype)
        # offload decision BEFORE build: the resident build device-puts the
        # full slab tensor, which would OOM HBM at exactly the beyond-HBM
        # sizes this branch serves (r5 review). The unpadded row bytes are
        # a lower bound on slab bytes; the padded post-build check below
        # still catches threshold crossings from lmax padding.
        thr = getattr(index.config, "stream_threshold_bytes", None)
        itemsize = 1 if dtype == "int8" else 4
        est_bytes = (len(rows) * build_kwargs.get("replicas", 1)
                     * rows.shape[1] * itemsize) if len(rows) else 0
        if thr is not None and est_bytes > thr:
            build_kwargs.setdefault("offload", True)
        ivf.build(rows, **build_kwargs)
        # remap packed ids from live-subset order to index row order, and
        # point paths at the FULL index path list so ivf.paths[id] and
        # index.paths[id] agree
        rid = (np.asarray(ivf._row_ids) if ivf._row_ids is not None
               else ivf._host_ids)
        remapped = np.where(rid >= 0, live[np.maximum(rid, 0)], -1).astype(np.int32)
        if ivf._offloaded:
            ivf._host_ids = remapped
        else:
            ivf._row_ids = jnp.asarray(remapped)
        ivf.paths = list(index.paths)
        ivf._custom_paths = True
        # count must cover the FULL index row space: remapped ids reach up
        # to index.count-1, and add() assigns tail ids starting at
        # self.count — with tombstones, live-count-based ids would collide
        # with remapped packed ids and resolve to the wrong paths
        ivf.count = index.count
        # beyond-HBM symmetry with the exact tier: when the base index is
        # configured to stream (slab bytes past stream_threshold_bytes),
        # the IVF tier offloads its slabs to host RAM the same way — but
        # transfers only PROBED slabs per query batch instead of the whole
        # gallery per sweep
        if ivf._offloaded:
            return ivf
        slab_bytes = ivf._packed.size * ivf._packed.dtype.itemsize
        if thr is not None and slab_bytes > thr:
            ivf.offload()
            return ivf
        # ANN tier rides the exact index's mesh: cluster slabs shard over the
        # same data axis the exact gallery rows do (multi-slice meshes keep
        # the single-chip path — the hierarchical DCN merge is exact-only)
        mesh = getattr(index, "mesh", None)
        if (
            mesh is not None
            and "slice" not in mesh.axis_names
            and mesh.shape.get(index.axis, 1) > 1
        ):
            ivf.attach_mesh(mesh, index.axis)
        return ivf

    def offload(self) -> "IVFIndex":
        """Beyond-HBM ANN tier: move the packed cluster slabs to host RAM
        and serve searches by gathering only the PROBED slabs to the device
        per query batch.

        Where the streamed exact tier (index/streaming.py) transfers the
        ENTIRE gallery per sweep (N*D bytes), the offloaded IVF transfers
        at most `unique_probed_clusters * lmax * D` — at 8M rows /
        nlist=4096 / nprobe=8 / Q=64 that is <=0.8 GB worst-case vs 4 GB,
        and far less when queries cluster (probe sets overlap). Centroids
        (tiny) stay device-resident for probe selection. Gathered slab
        tensors are bucketed to powers of two so compile count stays
        logarithmic. Recall is identical to the resident index (same
        probes, same scoring)."""
        if self._packed is None:
            raise ValueError("offload() before build()")
        self._host_packed = np.asarray(self._packed)
        self._host_ids = np.asarray(self._row_ids)
        self._host_slab_scales = (
            None if self._scales is None else np.asarray(self._scales)
        )
        self._packed = self._row_ids = self._scales = None  # free HBM
        self._offloaded = True
        self._sharded_fn = None
        return self

    def _gathered_search(self, q: np.ndarray, nprobe: int, kf: int):
        """Offloaded-path scoring: device probe selection -> host slab
        gather (unique probed clusters only) -> device score+top-k."""
        lmax, d = self._lmax, self._host_packed.shape[1]
        qu, probe = _probe_ids(jnp.asarray(q), self._centroids, nprobe)
        probe = np.asarray(probe)  # (Qb, nprobe) global cluster ids
        uniq, inv = np.unique(probe, return_inverse=True)
        u = len(uniq)
        # bucket the gathered-cluster count: one compile per power of two
        ub = 1 << int(np.ceil(np.log2(max(u, 1))))
        slabs = np.empty((ub * lmax, d), self._host_packed.dtype)
        idsg = np.full(ub * lmax, -1, np.int32)
        for j, c in enumerate(uniq):
            slabs[j * lmax : (j + 1) * lmax] = self._host_packed[
                c * lmax : (c + 1) * lmax
            ]
            idsg[j * lmax : (j + 1) * lmax] = self._host_ids[
                c * lmax : (c + 1) * lmax
            ]
        if u < ub:
            slabs[u * lmax :] = 0  # padded region: ids already -1 => masked
        scg = None
        if self._host_slab_scales is not None:
            scg = np.zeros(ub * lmax, np.float32)
            for j, c in enumerate(uniq):
                scg[j * lmax : (j + 1) * lmax] = self._host_slab_scales[
                    c * lmax : (c + 1) * lmax
                ]
        probe_local = inv.reshape(probe.shape).astype(np.int32)
        return _score_gathered(
            qu, jnp.asarray(probe_local), jnp.asarray(slabs),
            jnp.asarray(idsg), lmax, kf,
            None if scg is None else jnp.asarray(scg),
        )

    def attach_mesh(self, mesh, axis: str = "data") -> "IVFIndex":
        """Serve searches cluster-sharded over `mesh` transparently: search()
        (and everything built on it — recall_at, the app's two-phase ANN
        path) delegates to `sharded()`. The sharded arrays re-derive lazily
        after each (re)build. A 1-wide axis is a no-op (single-chip path)."""
        self._mesh = mesh
        self._mesh_axis = axis
        self._sharded_fn = None
        return self

    def _postprocess(self, vals, ids, nq, k, top_k, q, single):
        """Shared raw-candidates -> final (vals, ids) tail: slice to the
        real queries, keep-first replica dedup, exact tail merge. One body
        for search() and sharded().search_fn — the two copies had already
        drifted in variable names (r5 review)."""
        vals, ids = np.asarray(vals)[:nq], np.asarray(ids)[:nq]
        if self._replicas > 1:
            dv = np.full((nq, k), -np.inf, vals.dtype)
            di = np.full((nq, k), -1, ids.dtype)
            for r in range(nq):
                _, first = np.unique(ids[r], return_index=True)
                keep = np.sort(first)  # preserve score order
                keep = keep[ids[r][keep] >= 0][:k]
                dv[r, : len(keep)] = vals[r][keep]
                di[r, : len(keep)] = ids[r][keep]
            vals, ids = dv, di
        else:
            vals, ids = vals[:, :k], ids[:, :k]
        if self._tail_n:
            # incremental-insert tail: exact top-k over the tail buffer,
            # merged with the probed candidates (tail recall is 1.0)
            tv, ti = self._tail_topk(q, min(top_k, self._tail_n))
            vals = np.concatenate([vals, tv[:nq]], axis=1)
            ids = np.concatenate([ids, ti[:nq]], axis=1)
            order = np.argsort(-vals, axis=1, kind="stable")
            kk = min(top_k, self.count)
            vals = np.take_along_axis(vals, order, axis=1)[:, :kk]
            ids = np.take_along_axis(ids, order, axis=1)[:, :kk]
        return (vals[0], ids[0]) if single else (vals, ids)

    def sharded(self, mesh, axis: str = "data"):
        """Shard the built index's cluster slabs over a mesh axis and return
        a search callable with `search()`'s contract.

        Multi-chip serving shape (the Milvus-cluster replacement past one
        chip's HBM, reference docker-compose.yml + ImageEmbeddingSystem.py
        56-61): each device holds nlist/ndev cluster slabs; queries and the
        (tiny) centroid table are replicated; per-device top-k merges over
        ICI via a k-sized all_gather (sharded_ivf_search). nlist is padded
        with empty clusters (ids=-1, probe-masked via nlist_real) to the
        axis size so shard boundaries stay cluster-aligned. The incremental
        tail buffer is swept exactly on the default device and merged host-
        side — it is bounded at ~10% of rows by `needs_rebuild`."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._packed is None:
            raise ValueError(
                "sharded() needs device-resident slabs (build() first; an "
                "offloaded index serves via the host-gather path instead)"
            )
        ndev = mesh.shape[axis]
        nlist = self.nlist
        pad = (-nlist) % ndev
        packed = np.asarray(self._packed)
        ids = np.asarray(self._row_ids)
        scales = None if self._scales is None else np.asarray(self._scales)
        cent = np.asarray(self._centroids)
        lmax = self._lmax
        if pad:
            d = packed.shape[1]
            packed = np.concatenate(
                [packed, np.zeros((pad * lmax, d), packed.dtype)])
            ids = np.concatenate([ids, np.full(pad * lmax, -1, ids.dtype)])
            if scales is not None:
                scales = np.concatenate(
                    [scales, np.zeros(pad * lmax, np.float32)])
            cent = np.concatenate([cent, np.zeros((pad, d), cent.dtype)])
        row_sh = NamedSharding(mesh, P(axis, None))
        vec_sh = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        d_packed = jax.device_put(packed, row_sh)
        d_ids = jax.device_put(ids, vec_sh)
        d_scales = None if scales is None else jax.device_put(scales, vec_sh)
        d_cent = jax.device_put(cent, rep)
        nlist_pad = nlist + pad

        def search_fn(queries, top_k: int = 10, nprobe: Optional[int] = None):
            q = np.asarray(queries, np.float32)
            single = q.ndim == 1
            if single:
                q = q[None]
            nq = q.shape[0]
            # bucket Q like the single-chip path: sharded_ivf_search jits
            # per (Q, nprobe, kf) signature and remote compiles cost minutes
            from image_retrieval_tpu.index.vector_index import (
                ShardedVectorIndex,
            )

            qb = next(
                (b for b in ShardedVectorIndex._Q_BUCKETS if nq <= b), nq
            )
            if qb > nq:
                q = np.concatenate(
                    [q, np.zeros((qb - nq, q.shape[1]), np.float32)]
                )
            np_ = min(nprobe or self.nprobe, nlist)
            packed_n = self.count - self._tail_n
            k = min(top_k, packed_n, np_ * lmax)
            kf = min(k * self._replicas, np_ * lmax)
            kf = min(next((b for b in (16, 32, 64, 128, 256) if kf <= b), kf),
                     np_ * lmax, packed_n)
            vals, rids = sharded_ivf_search(
                jax.device_put(jnp.asarray(q), rep), d_cent, d_packed, d_ids,
                lmax, np_, kf, d_scales, mesh=mesh, axis=axis,
                nlist_real=nlist if pad else None,
            )
            return self._postprocess(vals, rids, nq, k, top_k, q, single)

        return search_fn

    def search(
        self, queries: np.ndarray, top_k: int = 10, nprobe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Approximate cosine top-k. Returns (scores, indices) like the exact
        index; indices refer to build() order."""
        if self.count == 0:
            raise ValueError("index is empty")
        if not self._offloaded and self._mesh is not None and (
            self._mesh.shape[self._mesh_axis] > 1
        ):
            if self._sharded_fn is None:
                self._sharded_fn = self.sharded(self._mesh, self._mesh_axis)
            return self._sharded_fn(queries, top_k=top_k, nprobe=nprobe)
        q = np.asarray(queries, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None]
        nq = q.shape[0]
        # _ivf_search jits per (Q, nprobe, k): bucket Q and k so serving
        # traffic with mixed micro-batch sizes / top_k values reuses a few
        # executables instead of compiling per signature (remote compiles
        # cost minutes; same rationale as ShardedVectorIndex._Q_BUCKETS)
        from image_retrieval_tpu.index.vector_index import ShardedVectorIndex

        qb = next(
            (b for b in ShardedVectorIndex._Q_BUCKETS if nq <= b), nq
        )
        if qb > nq:
            # pad with a COPY of a real query, not zeros: a zero query's
            # centroid sims are all zero, so its top-nprobe probes pick
            # arbitrary clusters and the offloaded path then gathers+
            # transfers slabs no real query needs (r5 review). Duplicate
            # probes dedup to nothing; pad results are sliced off below.
            q = np.concatenate([q, np.repeat(q[:1], qb - nq, axis=0)])
        np_ = min(nprobe or self.nprobe, self.nlist)
        packed_n = self.count - self._tail_n
        # k can't exceed the probed slot count (nprobe * lmax scores exist
        # per query) — small galleries with tight balance caps would
        # otherwise crash lax.top_k
        k = min(top_k, packed_n, np_ * self._lmax)
        # multi-assigned rows can appear once per replica in the raw top-k:
        # overfetch by the replica factor, dedup keep-first, truncate
        kf = min(k * self._replicas, np_ * self._lmax)
        kf = min(next((b for b in (16, 32, 64, 128, 256) if kf <= b), kf),
                 np_ * self._lmax, packed_n)
        if self._offloaded:
            vals, ids = self._gathered_search(q, np_, kf)
        else:
            vals, ids = _ivf_search(
                jnp.asarray(q), self._centroids, self._packed, self._row_ids,
                self._lmax, np_, kf, self._scales,
            )
        return self._postprocess(vals, ids, nq, k, top_k, q, single)

    def recall_at(self, queries: np.ndarray, exact_ids: np.ndarray, k: int = 10,
                  nprobe: Optional[int] = None) -> float:
        """Mean top-k recall vs exact ids — the nprobe tuning measurement."""
        from image_retrieval_tpu.index.evaluation import mean_recall

        _, got = self.search(queries, top_k=k, nprobe=nprobe)
        return mean_recall(got, exact_ids)
