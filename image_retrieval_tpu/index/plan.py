"""Capacity/latency planner: pick the index tier for a corpus size.

The framework has six measured storage/search tiers (resident f32 / bf16 /
int8 / int4-packed, streamed exact, offloaded IVF) plus mesh sharding.
Each was adopted or demoted from captured hardware numbers; this module
turns those captures into a single decision surface so callers don't have
to re-derive the crossovers from ARCHITECTURE.md.

Reference analog: the reference hard-codes ONE Milvus configuration for
every corpus (IVF_FLAT nlist=1024/nprobe=10,
/root/reference/src/ImageEmbeddingSystem.py:56-61) and leaves scaling to
the Milvus server. Here tier choice is explicit, measured, and returns the
exact ``IndexConfig``/``SearchConfig`` to construct.

Measured anchors (v5e single chip, 512-d; all cited from bench_results/):
  * resident single-query p50 at 1M rows: f32 2.86 ms, bf16 1.55 ms,
    int8 0.90 ms (BENCH_r01), int4 packed screen 1.10 ms + exact rerank
    (int4_probe.json).
  * resident batched sweeps run at ~148 GB/s effective on multi-GB
    galleries (16M int8 = 8 GB: 0.90 ms/query at Q=64,
    streaming_probe.json); smaller galleries do better (1M int8:
    0.02-0.05 ms/query) so the byte-rate estimate is an upper bound.
    The int4 tier BEATS this model since r4 (zero-copy segment maps):
    the paired Pallas screen sweeps 16M rows (4 GB packed) in 20.9 ms at
    Q=64 (206 GB/s), and latency mode's complete two-phase search runs
    15.1 ms device (int4_prod_probe.json) — the r3 XLA form ran 431 ms.
  * recall@10 vs the f32 oracle: int8 0.984, int4 two-phase 0.983
    (BENCH_r02, int4_probe.json); 10/10 oracle match spot-check at 256k.
  * usable HBM ~13.5 GB/chip (streaming_probe.json: a 16 GB gallery is
    genuinely beyond-chip) => ~27M int8 512-d rows or ~52M int4 rows
    resident per chip (32M int4 rows MEASURED resident at 8.6 GB with
    screen 26.4-28.2 ms/16q and two-phase recall@10 0.9891 at n=64 —
    int4_scale_probe.json r4; the 52M figure extrapolates 1.6x past
    that point).
  * streamed exact sweep runs AT the host->device transfer bound
    (overlap efficiency 1.04 at 16M and 32M rows, streaming_probe.json):
    sweep seconds = N*D bytes / link GB/s; amortize over the query batch.
  * offloaded IVF (clustered corpora): recall@10 0.958 at 0.088 ms/query
    at 8M, moving <=0.8 GB per 64-query batch vs the streamed sweep's
    N*D (ivf8m_probe.json, ivf_offload_probe.json). Unclustered recall
    collapses (0.35 at 1M, ivf_curve.json) -- never auto-picked unless
    the caller declares the corpus clustered.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

from image_retrieval_tpu.config import IndexConfig, SearchConfig

# --- measured constants (citations in the module docstring) ---------------
USABLE_HBM_BYTES = int(13.5 * (1 << 30))
SWEEP_GBPS = 148.0  # batched effective HBM rate on multi-GB galleries
SINGLE_Q_MS_1M = {"float32": 2.86, "bfloat16": 1.55, "int8": 0.90,
                  "int4": 1.10}
RECALL_AT_10 = {"float32": 1.0, "bfloat16": 0.999, "int8": 0.984,
                "int4": 0.983}
IVF_RECALL_CLUSTERED = 0.958
PCIE_GBPS = 16.0  # production-host default for streamed-tier estimates


def _bytes_per_row(dtype: str, dim: int) -> int:
    """Device-resident bytes per gallery row, including per-row scales."""
    if dtype == "float32":
        return 4 * dim
    if dtype == "bfloat16":
        return 2 * dim
    if dtype == "int8":
        return dim + 4
    if dtype == "int4":
        return dim // 2 + 4
    raise ValueError(f"unknown dtype {dtype!r}")


@dataclasses.dataclass(frozen=True)
class IndexPlan:
    """A concrete, measured-evidence-backed index recommendation."""

    tier: str                     # e.g. "resident-int8", "streamed-exact"
    index: IndexConfig
    search: SearchConfig
    n_devices: int
    rows_per_device: int
    est_hbm_bytes_per_device: int
    est_single_query_ms: Optional[float]
    est_batched_ms_per_query: Optional[float]
    expected_recall_at_10: float
    host_ram_bytes: int           # host-side copies the tier requires
    rationale: List[str]

    def describe(self) -> str:
        lines = [f"tier: {self.tier}",
                 f"devices: {self.n_devices} "
                 f"({self.rows_per_device:,} rows/device, "
                 f"{self.est_hbm_bytes_per_device / (1 << 30):.2f} GiB "
                 f"HBM/device)"]
        if self.est_single_query_ms is not None:
            lines.append(
                f"est single-query p50: {self.est_single_query_ms:.2f} ms")
        if self.est_batched_ms_per_query is not None:
            lines.append(f"est batched: "
                         f"{self.est_batched_ms_per_query:.3f} ms/query")
        lines.append(
            f"expected recall@10: {self.expected_recall_at_10:.3f}")
        if self.host_ram_bytes:
            lines.append(f"host RAM needed: "
                         f"{self.host_ram_bytes / (1 << 30):.2f} GiB")
        lines.append(f"config: dtype={self.index.dtype}"
                     + (f", stream_threshold_bytes="
                        f"{self.index.stream_threshold_bytes}"
                        if self.index.stream_threshold_bytes else "")
                     + (f", ann={self.search.ann}"
                        f" nlist={self.search.nlist}"
                        f" nprobe={self.search.nprobe}"
                        if self.search.ann != "exact" else ""))
        lines += [f"  - {r}" for r in self.rationale]
        return "\n".join(lines)


def _resident_plan(dtype: str, n_rows: int, dim: int, n_devices: int,
                   rows_per_dev: int, rationale: List[str]) -> IndexPlan:
    rows_m = rows_per_dev / 1e6
    bpr = _bytes_per_row(dtype, dim)
    # single-query: measured 1M anchor, linear in resident rows past 1M
    # (HBM-bound; the 8M int8 capture came in UNDER this line at 5.8 ms
    # vs 7.2 projected, so it is an upper bound).
    single = SINGLE_Q_MS_1M[dtype] * max(rows_m, 1.0) * (dim / 512.0)
    # batched: whole-gallery sweep at the effective HBM rate, amortized
    # over a 64-query dispatch (16M int8 measured 57.8 ms sweep =
    # 0.90 ms/query at Q=64, streaming_probe.json)
    batched = rows_per_dev * bpr / (SWEEP_GBPS * 1e9) * 1e3 / 64
    host = 0
    idx = IndexConfig(embedding_dim=dim, dtype=dtype)
    if dtype == "int4":
        # exact rerank reads the int8 copy from host RAM
        host = rows_per_dev * n_devices * (dim + 4)
        rationale.append(
            "int4 keeps an int8 copy in host RAM as the exact-rerank "
            "source (C rows/query gathered in phase 2)")
    return IndexPlan(
        tier=f"resident-{dtype}", index=idx, search=SearchConfig(),
        n_devices=n_devices, rows_per_device=rows_per_dev,
        est_hbm_bytes_per_device=rows_per_dev * bpr,
        est_single_query_ms=round(single, 2),
        est_batched_ms_per_query=round(batched, 4),
        expected_recall_at_10=RECALL_AT_10[dtype],
        host_ram_bytes=host, rationale=rationale)


def plan_index(
    n_rows: int,
    dim: int = 512,
    n_devices: int = 1,
    recall_floor: float = 0.98,
    clustered: bool = False,
    exact_scores: bool = False,
    usable_hbm_bytes: int = USABLE_HBM_BYTES,
    host_to_device_gbps: float = PCIE_GBPS,
) -> IndexPlan:
    """Pick the measured-best tier for a corpus.

    Args:
      n_rows / dim: corpus shape.
      n_devices: chips in the mesh; rows shard evenly over the 'data' axis.
      recall_floor: minimum acceptable recall@10 vs the f32 oracle.
        1.0 forces float32/bfloat16-exact tiers; the default 0.98 admits
        int8 (0.984 measured) and int4 two-phase (0.983).
      clustered: the corpus has cluster structure (e.g. category datasets).
        Gates IVF tiers -- on i.i.d. data IVF recall collapses (measured)
        and is never auto-picked.
      exact_scores: require bit-faithful f32 scores (not just top-k
        recall) -- e.g. for MI analysis over raw similarity values.
      usable_hbm_bytes: per-device gallery budget (v5e default).
      host_to_device_gbps: link rate used for streamed-tier estimates
        (PCIe-class default; the dev tunnel measures far lower).

    Returns an IndexPlan; ``plan.index`` / ``plan.search`` are ready to
    pass to ``ShardedVectorIndex`` / the searcher.
    """
    if n_rows <= 0:
        raise ValueError("n_rows must be positive")
    rows_per_dev = math.ceil(n_rows / n_devices)

    def fits(dtype: str) -> bool:
        return rows_per_dev * _bytes_per_row(dtype, dim) <= usable_hbm_bytes

    # dtype preference under the recall floor, fastest-first
    if exact_scores or recall_floor > RECALL_AT_10["bfloat16"]:
        ladder = ["float32"]
    elif recall_floor > RECALL_AT_10["int8"]:
        ladder = ["bfloat16", "float32"]
    elif recall_floor > RECALL_AT_10["int4"]:
        ladder = ["int8", "bfloat16", "float32"]
    else:
        ladder = ["int8", "int4", "bfloat16", "float32"]

    # int4 LATENCY tier (r4, int4_prod_probe.json): packed screen + int8
    # rows both resident (1.5x int8 bytes) with the exact rerank fused
    # into the screen dispatch. The screen sweeps HALF the int8 bytes, so
    # past the byte-bound threshold (~4M rows/dev, where the 16M capture
    # measured 30.2 vs int8's 57-61 ms per 64-query batch) it beats the
    # int8 sweep outright at int8-quality results (two-phase recall@10
    # 0.9922 vs the int8 oracle at C=128). Requires the paired-kernel
    # layout gates (dim % 512 == 0).
    latency_bpr = dim // 2 + dim + 8  # packed + int8 rows + both scales
    if ("int4" in ladder and dim % 512 == 0
            and rows_per_dev >= 4_000_000
            and rows_per_dev * latency_bpr <= usable_hbm_bytes):
        return IndexPlan(
            tier="resident-int4-latency",
            index=IndexConfig(embedding_dim=dim, dtype="int4",
                              rerank_device=True),
            search=SearchConfig(),
            n_devices=n_devices, rows_per_device=rows_per_dev,
            est_hbm_bytes_per_device=rows_per_dev * latency_bpr,
            est_single_query_ms=round(
                SINGLE_Q_MS_1M["int4"] * max(rows_per_dev / 1e6, 1.0)
                * (dim / 512.0), 2),
            est_batched_ms_per_query=round(
                rows_per_dev * (dim // 2 + 4) / (SWEEP_GBPS * 1e9)
                * 1e3 / 64, 4),
            expected_recall_at_10=RECALL_AT_10["int4"],
            host_ram_bytes=0,
            rationale=[
                "int4-latency: packed screen sweeps HALF the int8 bytes "
                "with the exact int8 rerank fused into the same dispatch "
                "(rerank_device; 16M x 512 measured 15.1 ms device vs "
                "int8's 57-61 ms per 64-query batch, "
                "int4_prod_probe.json); costs 1.5x int8's HBM and "
                "returns int8-identical scores for every row the screen "
                "covers"])

    for dtype in ladder:
        if fits(dtype):
            rationale = [
                f"{dtype} is the fastest measured tier meeting "
                f"recall_floor={recall_floor} "
                f"(recall@10 {RECALL_AT_10[dtype]:.3f}) that fits "
                f"{rows_per_dev:,} rows/device in "
                f"{usable_hbm_bytes / (1 << 30):.1f} GiB HBM"]
            # Latency-hungry multi-M resident plans flip approx_select ON
            # (VERDICT r4 item 4): the selector's candidate set is
            # approximate but its scores are TRUE, so the combined recall
            # is the dtype recall x the selector's measured 0.9984 — still
            # above the default 0.98 floor for every admitted dtype. At
            # multi-M rows the exact lax.top_k selection dominates the
            # batched sweep (9.8 vs 56.6 ms at 16M int8,
            # int8_tiled_probe.json); below ~4M rows/device the sweep is
            # bandwidth-bound and the selector doesn't matter.
            approx_on = (dtype in ("int8", "bfloat16", "float32")
                         and not exact_scores
                         and rows_per_dev >= 4_000_000
                         and recall_floor <= RECALL_AT_10[dtype] * 0.9984)
            if approx_on:
                rationale.append(
                    "approx_select enabled: approximate candidate SET, "
                    "true scores — 5.8x batched latency at multi-M rows "
                    "(recall@10 0.9984 at 16M vs the same tier's exact "
                    "selection, int8_tiled_probe.json); pass "
                    "recall_floor > dtype_recall*0.9984 or "
                    "search(approx=False) to force exact selection")
            if dtype == "float32" and not exact_scores and len(ladder) == 1:
                rationale.append(
                    "recall_floor > 0.999 forces the f32 oracle tier")
            if exact_scores:
                rationale.append("exact_scores=True forces f32 (raw "
                                 "similarity values, e.g. MI analysis)")
            plan = _resident_plan(dtype, n_rows, dim, n_devices,
                                  rows_per_dev, rationale)
            if approx_on:
                plan.index.approx_select = True
                plan = dataclasses.replace(
                    plan,
                    expected_recall_at_10=round(
                        RECALL_AT_10[dtype] * 0.9984, 4),
                    # measured at 16M int8: 9.8 ms / 64 queries vs the
                    # exact sweep's 56.6 — the selector removes the
                    # top_k term, leaving ~the bandwidth sweep / 5.8
                    est_batched_ms_per_query=round(
                        plan.est_batched_ms_per_query / 5.8, 4),
                )
            return plan

    # Nothing fits resident: first say how many chips WOULD make the best
    # resident tier fit (mesh sharding is the preferred scale-out,
    # parallel/collectives.py k-sized ICI merge is constant-cost).
    best = ladder[0]
    need = math.ceil(n_rows * _bytes_per_row(best, dim) / usable_hbm_bytes)
    shard_note = (
        f"preferred scale-out: shard over {need} devices "
        f"(resident-{best}, constant-cost ICI top-k merge); "
        f"only {n_devices} available, falling back to beyond-HBM tiers")

    gallery_bytes = n_rows * dim  # int8 body, the streamed/IVF store
    if clustered and recall_floor <= IVF_RECALL_CLUSTERED:
        from image_retrieval_tpu.index.ivf import recommended_ivf

        op = recommended_ivf(n_rows)
        nlist, nprobe = op if op else (0, 0)
        idx = IndexConfig(embedding_dim=dim, dtype="int8",
                          stream_threshold_bytes=usable_hbm_bytes)
        # transfer per 64-query batch: <= nprobe*64 unique slabs of
        # ~(N/nlist) rows; measured <=0.8 GB at the 8M operating point.
        slab_bytes = math.ceil(n_rows / max(nlist, 1)) * dim
        batch_bytes = min(nprobe * 64, nlist) * slab_bytes
        est = batch_bytes / (host_to_device_gbps * 1e9) * 1e3 / 64
        return IndexPlan(
            tier="ivf-offload", index=idx,
            search=SearchConfig(ann="ivf", nlist=nlist, nprobe=nprobe),
            n_devices=n_devices, rows_per_device=0,
            est_hbm_bytes_per_device=batch_bytes,
            est_single_query_ms=None,
            est_batched_ms_per_query=round(est, 4),
            expected_recall_at_10=IVF_RECALL_CLUSTERED,
            host_ram_bytes=gallery_bytes + 4 * n_rows,
            rationale=[
                shard_note,
                "clustered corpus beyond HBM: offloaded IVF moves only "
                "the batch's probed slabs (recall@10 0.958 measured at "
                "8M, ivf_offload_probe.json); estimate is the "
                "worst-case transfer bound at "
                f"{host_to_device_gbps:.0f} GB/s"])

    # streamed exact sweep: recall 1.0 (int8 math), transfer-bound
    idx = IndexConfig(embedding_dim=dim, dtype="int8",
                      stream_threshold_bytes=usable_hbm_bytes)
    sweep_s = gallery_bytes / (host_to_device_gbps * 1e9)
    return IndexPlan(
        tier="streamed-exact", index=idx, search=SearchConfig(),
        n_devices=n_devices, rows_per_device=0,
        est_hbm_bytes_per_device=0,
        est_single_query_ms=None,
        est_batched_ms_per_query=round(sweep_s / 64 * 1e3, 3),
        expected_recall_at_10=RECALL_AT_10["int8"],
        host_ram_bytes=gallery_bytes + 4 * n_rows,
        rationale=[
            shard_note,
            ("unclustered corpus (or recall_floor above the IVF point): "
             if not clustered else
             f"recall_floor={recall_floor} exceeds the measured IVF "
             "recall 0.958: ")
            + "streamed exact sweep runs AT the transfer bound (overlap "
              "1.04 measured, streaming_probe.json); estimate assumes a "
              f"{host_to_device_gbps:.0f} GB/s link and a 64-query batch "
              "amortizing each sweep"])
