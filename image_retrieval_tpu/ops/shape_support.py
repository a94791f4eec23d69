"""Mosaic compile-shape support table for the fused Pallas kernel family.

Interpret-mode tests cannot catch compile-time Mosaic rejections: the bf16
fused kernels reject some lane-unaligned t on hardware (e.g. a
(4, 11, 64) -> (44, 64) reshape fails to lower, while the production
t = 50/77/197 all compile), and the bf16 whole-layer kernel exceeds scoped
VMEM at width 768. `tools/tpu_mosaic_shapes.py` compiles the kernel family
over a (kernel, width, t, dtype) grid ON the real chip — compile-only, tiny
batch — and writes `bench_results/mosaic_shapes.json`; this module loads
that table and answers support queries.

Fallback semantics: a grid point (or the whole table) that was never swept
answers from the measured heuristics that shipped before the table existed
(VMEM-budget width caps, ops/flash_attention.py _block_images_fused
docstring), so environments without the JSON behave exactly as before.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

_TABLE_ENV = "IR_MOSAIC_SHAPES"


def table_path() -> str:
    return os.environ.get(
        _TABLE_ENV,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "bench_results", "mosaic_shapes.json",
        ),
    )


@functools.lru_cache(maxsize=4)
def _load(path: str):
    if not os.path.exists(path):
        return None
    try:
        with open(path, encoding="utf-8") as f:
            entries = json.load(f)
        return {
            (e["kernel"], bool(e["quant"]), int(e["width"]), int(e["t"])):
                bool(e["ok"])
            for e in entries
            if "kernel" in e
        }
    except Exception:
        return None


def lookup(kernel: str, quant: bool, width: int, t: int) -> Optional[bool]:
    """True/False if this exact point was swept on hardware, else None.

    kernel: "layer" | "attn" | "mlp" (int8 vs bf16 selected by `quant`)."""
    table = _load(table_path())
    if table is None:
        return None
    return table.get((kernel, bool(quant), int(width), int(t)))


def layer_kernel_fits(quant: bool, width: int, t: int) -> bool:
    """Whole-layer mega-kernel feasibility (models/clip.py Block).

    Sweep table first; otherwise the measured VMEM envelope: weights are
    12*w^2 bytes int8 / 24*w^2 bf16 against the ~16 MB scoped-VMEM budget —
    int8 fits through width 768 (7.1 MB, measured), bf16 through width 512
    (768 bf16 = 14.2 MB measured OOM)."""
    hit = lookup("layer", quant, width, t)
    if hit is not None:
        return hit
    return (quant and width <= 768) or (not quant and width <= 512)


def attn_kernel_fits(quant: bool, width: int, t: int) -> bool:
    """Fused attention sub-block feasibility (sweep table, else assume
    supported — unknown exotic t fails loudly at compile time)."""
    hit = lookup("attn", quant, width, t)
    return True if hit is None else hit


def mlp_kernel_fits(quant: bool, width: int, t: int) -> bool:
    """Fused MLP sub-block feasibility. Gated separately from attention:
    the MLP kernel has no attention choreography, so a sweep entry that
    rejects the attention kernel must not take the MLP kernel down with
    it (models/clip.py Block keeps fused_mlp on masked/oversized layers)."""
    hit = lookup("mlp", quant, width, t)
    return True if hit is None else hit


def subblock_kernel_fits(quant: bool, width: int, t: int) -> bool:
    """BOTH fused sub-blocks feasible (the layer-replacement path needs the
    pair). Sweep table first; otherwise assume supported EXCEPT the known
    bf16 lane-alignment rejection: packed rows bm*t must tile to the 8-row
    sublane granule for the kernel's (bm*t, w) operands, and every
    measured failure had t % 8 not in {0, 1, 2, 4} with bm > 1 collapsing
    to odd row counts. Production towers (t = 50, 77, 197) all compile;
    the conservative fallback only rejects nothing — unknown exotic t
    fails loudly at compile time rather than silently here."""
    return attn_kernel_fits(quant, width, t) and mlp_kernel_fits(
        quant, width, t
    )
