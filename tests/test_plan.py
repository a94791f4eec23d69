"""Tier planner: the measured decision surface in index/plan.py.

The reference hard-codes one Milvus IVF_FLAT config for every corpus
(/root/reference/src/ImageEmbeddingSystem.py:56-61); plan_index() instead
picks between the framework's measured tiers. These tests pin the
crossovers to the captured numbers the planner encodes."""

import math

import pytest

from image_retrieval_tpu.config import IndexConfig, SearchConfig
from image_retrieval_tpu.index.plan import (
    USABLE_HBM_BYTES, IndexPlan, plan_index)


def test_small_corpus_picks_resident_int8():
    plan = plan_index(1_000_000)
    assert plan.tier == "resident-int8"
    assert plan.index.dtype == "int8"
    assert plan.search.ann == "exact"
    assert plan.expected_recall_at_10 >= 0.98
    assert plan.est_single_query_ms <= 1.0  # 0.90 ms measured at 1M
    assert plan.host_ram_bytes == 0


def test_recall_floor_one_forces_f32():
    plan = plan_index(1_000_000, recall_floor=1.0)
    assert plan.tier == "resident-float32"
    assert plan.expected_recall_at_10 == 1.0


def test_exact_scores_forces_f32_even_with_low_floor():
    plan = plan_index(1_000_000, recall_floor=0.5, exact_scores=True)
    assert plan.tier == "resident-float32"
    assert any("exact_scores" in r for r in plan.rationale)


def test_recall_between_int8_and_bf16_picks_bf16():
    plan = plan_index(1_000_000, recall_floor=0.99)
    assert plan.tier == "resident-bfloat16"


def test_int4_engages_past_the_int8_capacity_wall():
    # ~27M int8 rows fit 13.5 GiB at 512-d; 40M do not, but nibble-packed
    # int4 (D/2+4 bytes/row) does.
    plan = plan_index(40_000_000)
    assert plan.tier == "resident-int4"
    assert plan.index.dtype == "int4"
    assert plan.est_hbm_bytes_per_device <= USABLE_HBM_BYTES
    # int8 rerank copy lives in host RAM
    assert plan.host_ram_bytes >= 40_000_000 * 512


def test_int4_skipped_when_floor_above_its_recall():
    # 0.9835 floor excludes int4 (0.983) but not int8 (0.984); 40M int8
    # doesn't fit one chip and bf16/f32 are bigger still -> streamed.
    plan = plan_index(40_000_000, recall_floor=0.9835)
    assert plan.tier == "streamed-exact"
    assert plan.index.stream_threshold_bytes == USABLE_HBM_BYTES


def test_mesh_sharding_keeps_huge_corpora_resident():
    # 10M rows/device is past the byte-bound threshold where the int4
    # latency tier (packed screen + fused device rerank) beats the int8
    # sweep at 1.5x its HBM (int4_prod_probe.json: 30.2 vs 57-61 ms at
    # 16M); r3 expected resident-int8 here
    plan = plan_index(80_000_000, n_devices=8)
    assert plan.tier == "resident-int4-latency"
    assert plan.index.dtype == "int4" and plan.index.rerank_device
    assert plan.rows_per_device == math.ceil(80_000_000 / 8)
    assert plan.est_hbm_bytes_per_device <= USABLE_HBM_BYTES


def test_latency_tier_needs_room_and_scale():
    # too small (byte-bound threshold not reached) -> int8
    assert plan_index(1_000_000).tier == "resident-int8"
    # non-512-multiple dim fails the paired-kernel gate -> int8
    assert plan_index(8_000_000, dim=256).tier == "resident-int8"
    # 1.5x bytes does not fit but int8 does -> int8 (25M x 768 B/row)
    p = plan_index(25_000_000)
    assert p.tier == "resident-int8"


def test_beyond_hbm_clustered_picks_offloaded_ivf():
    plan = plan_index(64_000_000, clustered=True, recall_floor=0.95)
    assert plan.tier == "ivf-offload"
    assert plan.search.ann == "ivf"
    assert plan.search.nlist >= 1024 and plan.search.nprobe == 8
    assert plan.index.stream_threshold_bytes == USABLE_HBM_BYTES
    # the plan names the preferred scale-out (mesh sharding) in rationale
    assert any("shard over" in r for r in plan.rationale)


def test_beyond_hbm_unclustered_streams_exact():
    plan = plan_index(64_000_000, clustered=False, recall_floor=0.95)
    assert plan.tier == "streamed-exact"
    assert plan.expected_recall_at_10 >= 0.95
    assert plan.est_batched_ms_per_query is not None


def test_clustered_but_high_floor_still_streams():
    # floor above IVF's measured 0.958 -> exact streamed even if clustered
    plan = plan_index(64_000_000, clustered=True, recall_floor=0.97)
    assert plan.tier == "streamed-exact"


def test_configs_are_constructible_types():
    plan = plan_index(5_000_000)
    assert isinstance(plan, IndexPlan)
    assert isinstance(plan.index, IndexConfig)
    assert isinstance(plan.search, SearchConfig)
    assert plan.describe()  # non-empty human rendering


def test_dim_scales_capacity():
    # 1024-d rows are twice the bytes: the int8 wall halves
    p512 = plan_index(20_000_000, dim=512)
    p1024 = plan_index(20_000_000, dim=1024)
    assert p512.tier == "resident-int8"
    assert p1024.tier in ("resident-int4", "streamed-exact")


def test_rejects_nonpositive_rows():
    with pytest.raises(ValueError):
        plan_index(0)


def test_cli_plan_subcommand(capsys):
    from image_retrieval_tpu.app.cli import main

    assert main(["plan", "--rows", "1000000"]) == 0
    out = capsys.readouterr().out
    assert "resident-int8" in out


def test_plan_flips_approx_select_at_scale():
    """Latency-hungry multi-M resident plans enable approx_select
    (VERDICT r4 item 4): approximate candidate SET, true scores."""
    # dim=256 keeps the int4-latency tier out (its paired kernel needs
    # dim % 512 == 0), so the plan lands on resident-int8 at >=4M rows/dev
    plan = plan_index(8_000_000, dim=256)
    assert plan.tier == "resident-int8"
    assert plan.index.approx_select is True
    assert any("approx_select enabled" in r for r in plan.rationale)
    assert plan.expected_recall_at_10 == round(0.984 * 0.9984, 4)

    # below the crossover the sweep is bandwidth-bound: stay exact
    small = plan_index(1_000_000)
    assert small.index.approx_select is False

    # a floor above the combined recall forces exact selection
    strict = plan_index(8_000_000, dim=256, recall_floor=0.9835)
    assert strict.index.approx_select is False

    # exact_scores (MI analysis) never flips it
    mi = plan_index(8_000_000, dim=256, recall_floor=0.5, exact_scores=True)
    assert mi.index.approx_select is False
