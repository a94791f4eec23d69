"""Unified configuration for the framework.

Replaces the reference's two-tier config (constants in config.py:1-7 plus
hard-coded duplicates of the model name in app_pipeline.py:103,181 and
color_analysis_workflow.py:92, plus per-function analysis knobs in
mi_analysis.py:31,162,1273) with one dataclass covering model, mesh,
index, and analysis settings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Constants kept for compatibility with reference config.py:3-7.
EMBEDDING_DIM = 512
BATCH_SIZE = 100
SCORE_THRESHOLD = 0.25

# One canonical copy of the reference's default optimized-similarity
# weights (app_pipeline.py:379-385) — search.py and SimpleSearcher both
# read it, so a re-weighting can never drift between surfaces.
DEFAULT_SIMILARITY_PARAMS = {
    "w_angle": 1.0, "w_l1": 0.0, "w_l2": 0.0, "w_inf": 0.0, "w_mag": 0.0,
}


@dataclasses.dataclass
class ModelConfig:
    """CLIP ViT-B/32 hyperparameters (the reference's hard-coded
    "openai/clip-vit-base-patch32", app_pipeline.py:103)."""

    name: str = "clip-vit-base-patch32"
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = EMBEDDING_DIM
    dtype: str = "bfloat16"  # compute dtype; params + accum stay f32
    remat: bool = False  # rematerialize transformer blocks in the backward
    #                      pass (jax.checkpoint) — trades FLOPs for memory at
    #                      large train batch sizes
    # -- numerics-preserving layout variants (TPU perf experiments; defaults
    #    are the measured-fastest settings for the v5e embed path) --
    # Pad the vision token sequence (CLS + 49 patches) up to this length with
    # attention-masked zero tokens: 0 = no padding. Padded keys get -inf
    # attention bias, so outputs for real tokens are IDENTICAL.
    vision_seq_pad: int = 0
    # Lower the patch conv as reshape -> one MXU matmul instead of nn.Conv.
    patch_embed_matmul: bool = False
    # Use jax.nn.dot_product_attention (XLA fused attention) in Blocks.
    fused_attention: bool = False
    # Fused Pallas attention (ops/flash_attention.py): packed block-diagonal
    # per-image attention, VMEM-resident scores/softmax. Applies where no
    # attention mask is needed (the vision tower); the text tower's causal
    # path keeps the XLA einsum. Backward recomputes via XLA (custom VJP).
    pallas_attention: bool = False
    # Fuse the WHOLE pre-LN attention sub-block (LN1 + QKV + attention +
    # out-proj + residual) into one kernel with VMEM-resident layer weights
    # (ops/flash_attention.py attention_block). Mask-free towers only; with
    # int8_matmuls the projections run int8 x int8 on the MXU in-kernel
    # (attention_block_int8).
    fused_attn_block: bool = False
    # Fuse the pre-LN MLP sub-block (LN2 + fc1 + quick_gelu + fc2 +
    # residual) into one kernel, both MLP weights VMEM-resident
    # (ops/flash_attention.py mlp_block / mlp_block_int8). Same mask-free
    # restriction as above.
    fused_mlp_block: bool = False
    # Fuse the WHOLE transformer layer (attention + MLP sub-blocks) into a
    # single kernel per layer — removes the mid-layer activation HBM
    # round-trip. With int8_matmuls the projections run int8 in-kernel
    # (layer_block_int8, the vit_b32_serving path); without, the bf16
    # variant (layer_block) keeps closer numerics.
    fused_layer_block: bool = False
    # Training-oriented VJP for the fused attention sub-block: the forward
    # kernel saves q/k/v/attn/probs and the backward is hand-written XLA
    # over them (no forward recompute). Gradient-parity-tested, but
    # MEASURED SLOWER than baseline XLA training (1.9k vs 2.3k img/s at
    # batch 128, bench_results/train_fusedtrain.json — the extra
    # activation writes and halved kernel block outweigh the recompute
    # saving, since XLA's own backward never recomputes). Kept as the
    # measured record; leave off for training throughput.
    fused_train_vjp: bool = False
    # Serving-time quantization: run the big projections (QKV/out, MLP) as
    # int8 x int8 -> int32 MXU matmuls with dynamic per-token activation and
    # per-channel weight scales. v5e int8 peak is 2x bf16; embedding cosine
    # vs the f32 tower stays >0.99. Inference-only numerics trade (keep off
    # for training).
    int8_matmuls: bool = False


def vit_b32() -> "ModelConfig":
    return ModelConfig()


def vit_b32_serving() -> "ModelConfig":
    """Measured-fastest v5e serving configuration
    (bench_results/attn_probe9.json): one mega-kernel per transformer
    layer (ops/flash_attention.py layer_block_int8 — LN1 + int8 QKV +
    attention + out-proj + residual + LN2 + int8 MLP + residual, all layer
    weights VMEM-resident, causal mask in-kernel for the text tower) —
    20.9k img/s at batch 256 (vs 11.4k baseline bf16) and 26.5k texts/s
    (vs 18.1k). Embedding cosine vs the bf16 tower stays >0.999; use the
    default config where bit-level parity with the training/eval path
    matters."""
    return serving_config(ModelConfig())


def vit_b16() -> "ModelConfig":
    return dataclasses.replace(ModelConfig(), name="clip-vit-base-patch16",
                               patch_size=16)


def vit_l14() -> "ModelConfig":
    return dataclasses.replace(
        ModelConfig(), name="clip-vit-large-patch14", patch_size=14,
        vision_width=1024, vision_layers=24, vision_heads=16,
        text_width=768, text_layers=12, text_heads=12, embed_dim=768,
    )


def serving_config(base: "ModelConfig") -> "ModelConfig":
    """Apply the measured-fastest v5e serving execution strategy (whole-layer
    int8 mega-kernels, see vit_b32_serving) to ANY architecture preset:
    `serving_config(vit_b16())`, `serving_config(vit_l14())`. Towers wider
    than 768 take the per-sub-block fused kernels BY MEASUREMENT, not as a
    fallback: the width-1024 whole-layer kernel compiles under the raised
    wide-tower VMEM ceiling but runs 4% slower than the sub-block pair on
    the L/14 tower (1168 vs 1218 img/s at batch 128, preset_probe.json
    r4). Measured: B/32 20.9k img/s, B/16 6.0k, L/14 1.22k (vs 0.65k
    parity) (bench_results/attn_probe9/10.json, preset_probe.json);
    cosine >0.999 vs the bf16 tower; inference-only numerics."""
    return dataclasses.replace(base, fused_layer_block=True, int8_matmuls=True)


@dataclasses.dataclass
class MeshConfig:
    """Device mesh layout. `data` shards the batch / gallery rows,
    `model` shards weight matrices (tensor parallelism)."""

    data: int = -1  # -1 -> use all devices on the data axis
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")


@dataclasses.dataclass
class IndexConfig:
    """Sharded exact-search index settings (replaces Milvus IVF_FLAT,
    reference ImageEmbeddingSystem.py:56-61)."""

    embedding_dim: int = EMBEDDING_DIM
    shard_axis: str = "data"  # mesh axis the gallery rows are sharded over
    capacity_step: int = 65536  # gallery grows in device-friendly chunks
    # Gallery storage dtype — the search sweep is HBM-bandwidth bound, so
    # this is the latency lever:
    #   float32  : oracle ranking parity (default)
    #   bfloat16 : 2x less traffic, ~0.4% relative score error
    #   int8     : 4x less traffic (symmetric per-row scales), ~0.5% error
    #   int4     : CAPACITY tier — device rows are nibble-packed (D/2
    #              bytes/dim-pair): ~2x the resident rows per chip vs int8
    #              (~54M 512-d rows on v5e). Search is two-phase (cosine
    #              only): packed screen sweep at int8-parity latency
    #              (1.10 vs 1.12 ms/query at 1M) -> exact int8 rerank of
    #              the top rerank_c candidates from the host-RAM int8 copy
    #              (recall@10 0.983 vs int8's 0.984;
    #              bench_results/int4_probe.json). The host hop costs
    #              microseconds on production hosts (PCIe gather of
    #              rerank_c rows/query).
    dtype: str = "float32"
    # int4 two-phase: candidates screened per query before the exact
    # rerank. 128 measured recall@10 0.983 at 1M (int8-parity); raise for
    # deeper galleries or larger top_k.
    rerank_c: int = 128
    # Beyond-HBM tier: when the (int8) gallery exceeds this many bytes, the
    # cosine path streams host-RAM chunks through a double-buffered device
    # window (index/streaming.py) instead of residing on device. None
    # disables (default). Measured: the streamed sweep runs AT the
    # host->device transfer bound with overlap efficiency ~1.04 at 16-32M
    # rows (bench_results/streaming_probe.json); crossover guidance in
    # ARCHITECTURE.md (resident to ~27M rows/chip on v5e, then mesh
    # sharding, then streaming).
    stream_threshold_bytes: Optional[int] = None
    # int8 + optimized_similarity lever: keep a pre-dequantized bf16 copy
    # of the rows on device so the L1/L∞ sweep skips the per-element
    # dequant multiply (ops/metrics.py make_l1_shadow — results are
    # BITWISE identical; costs a second, bf16-sized gallery in HBM).
    # Resident int8 indexes (flat or multi-slice meshes; the streamed
    # beyond-HBM tier ignores it). Measured head-to-head and SLOWER
    # (2.25 vs 1.81 ms/query at 1M — the extra bf16 HBM read outweighs
    # the saved multiply; bench_results/scorer_probe.json), so the
    # default stays off; the flag remains for galleries whose scales
    # make the dequant multiply dominant.
    l1_shadow: bool = False
    # int4 LATENCY mode: also keep the int8 rows ON DEVICE so the exact
    # rerank runs inside the same dispatch as the screen — no host hop,
    # ONE fetch per search. Costs 1.5x int8's HBM (int8 rows + the packed
    # screen copy) but the int4 screen sweeps HALF the bytes of the int8
    # sweep, so when both tiers fit this is the FASTEST exact-int8-quality
    # configuration (16M x 512: screen 30.2 ms + in-jit rerank vs the int8
    # sweep's 57-61 ms per 64-query batch — int4_prod_probe.json). Ignored
    # unless dtype == "int4"; falls back to the host-gather rerank when
    # off (the capacity configuration: int8 rows stay in host RAM).
    rerank_device: bool = False
    # Approximate SELECTION for the resident f32/bf16/int8 tiers: per-shard
    # approx_max_k over-selects 4k/128 candidates (whose scores are the
    # TRUE scores) before the exact top-k — only the candidate set is
    # approximate. Measured at 16M x 512 int8, Q=64: 9.8 ms vs the exact
    # sweep's 56.6 ms (5.8x) at recall@10 0.9984
    # (bench_results/int8_tiled_probe.json). Default OFF: exact results
    # are the tier contract; flip for serving fleets that take Milvus-IVF-
    # grade recall (the reference's default) for a 5-6x latency cut at
    # >=multi-M rows. Flat meshes only (the multislice path stays exact).
    approx_select: bool = False


@dataclasses.dataclass
class AnalysisConfig:
    """MI-analysis knobs (reference mi_analysis.py:31,162,1273)."""

    num_pairs: int = 1000
    num_bins: int = 20
    bin_strategy: str = "uniform"
    grid_size: int = 3  # weight-optimization grid (reference mi_analysis.py:1205)
    max_sampled_comparisons: int = 50000  # reference mi_analysis.py:63
    seed: int = 42  # reference mi_analysis.py:54,1372


@dataclasses.dataclass
class SearchConfig:
    """Search behavior (reference image_search.py:34-40, app_pipeline.py:167)."""

    score_threshold: float = SCORE_THRESHOLD
    # Reference app_pipeline.py:167 ranks by abs(similarity); kept behind a flag.
    rank_by_abs: bool = True
    # Candidate overfetch factor used by the reference ANN path
    # (image_search.py:93 uses 3x, :169 uses 5x). The exact index makes this a
    # no-op for correctness but it is honored for behavioral parity.
    overfetch: int = 3
    # Candidate generation: "exact" (sharded exact index, recall 1.0),
    # "ivf" (on-device IVF, the Milvus IVF_FLAT analog — reference
    # ImageEmbeddingSystem.py:56-61 nlist=1024, image_search.py:88 nprobe=10),
    # or "screen" (projection-screened two-phase: int8 sketch sweep -> exact
    # rerank, index/screen.py — the TPU-native IVF_SQ8/PQ replacement).
    ann: str = "exact"
    # nlist/nprobe = 0 means "auto": pick the measured operating point for
    # the gallery size (index.ivf.recommended_ivf — nlist ~ 2*sqrt(N) as a
    # power of two, nprobe=8; 8M clustered measured recall@10 0.958 at 5.1x
    # the exact sweep's speed), falling back to the exact engine below the
    # ~4M-row crossover where IVF buys nothing.
    nlist: int = 1024
    nprobe: int = 10
    # ann="screen" knobs: sketch width (projected dims swept in phase 1 —
    # HBM reads scale as screen_dims/D) and the per-shard candidate pool
    # reranked exactly in phase 2.
    screen_dims: int = 128
    screen_candidates: int = 128


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    index: IndexConfig = dataclasses.field(default_factory=IndexConfig)
    analysis: AnalysisConfig = dataclasses.field(default_factory=AnalysisConfig)
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    batch_size: int = BATCH_SIZE
    weights_path: Optional[str] = None  # HF checkpoint dir for porting, if present

    @property
    def similarity_params(self) -> dict:
        """Default optimized-similarity weights (reference app_pipeline.py:379-385)."""
        return dict(DEFAULT_SIMILARITY_PARAMS)


def default_config() -> Config:
    return Config()
