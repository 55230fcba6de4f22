"""Typed configuration tree — replaces the reflection-based flag system.

The reference builds argparse flags from class attributes
(``arguments/__init__.py:19-45`` ``ParamGroup``) and persists runs as an
eval'd ``cfg_args`` literal; here the same parameter surface is typed
dataclasses serialized to JSON (SURVEY.md §5 config note).  Defaults mirror
``arguments/__init__.py:47-241`` with the ``scripts/run.py:25-79`` overrides
noted inline.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """arguments/__init__.py:47-84 (ModelParams)."""
    feat_dim: int = 32
    n_offsets: int = 10
    voxel_size: float = 0.001        # run.py uses 0.005
    update_depth: int = 3
    update_init_factor: int = 16
    update_hierachy_factor: int = 4
    use_feat_bank: bool = False
    source_path: str = ""
    model_path: str = ""
    resolution: int = -1
    white_background: bool = False
    eval: bool = True
    specified_ply_path: str = ""
    load_mask: bool = True
    load_depth: bool = True
    is_spin: bool = True
    ref_image_path: str = ""
    ref_depth_path: str = ""
    # TPU-specific capacities (static shapes; overflow reported)
    anchor_capacity: int = 2 ** 17
    instance_capacity: int = 2 ** 21


@dataclass(frozen=True)
class OptimConfig:
    """arguments/__init__.py:93-241 (OptimizationParams) + run.py overrides."""
    iterations: int = 30_000
    position_lr_init: float = 0.0
    position_lr_final: float = 0.0
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    offset_lr_init: float = 0.01
    offset_lr_final: float = 0.0001
    offset_lr_delay_mult: float = 0.01
    offset_lr_max_steps: int = 30_000
    feature_lr: float = 0.0075
    opacity_lr: float = 0.02
    uncertainty_lr: float = 0.02
    scaling_lr: float = 0.007
    rotation_lr: float = 0.002
    mlp_opacity_lr_init: float = 0.002
    mlp_opacity_lr_final: float = 0.00002
    mlp_opacity_lr_delay_mult: float = 0.01
    mlp_opacity_lr_max_steps: int = 30_000
    mlp_uncertainty_lr_init: float = 0.002
    mlp_uncertainty_lr_final: float = 0.00002
    mlp_uncertainty_lr_delay_mult: float = 0.01
    mlp_uncertainty_lr_max_steps: int = 30_000
    mlp_cov_lr_init: float = 0.004
    mlp_cov_lr_final: float = 0.004
    mlp_cov_lr_delay_mult: float = 0.01
    mlp_cov_lr_max_steps: int = 30_000
    mlp_color_lr_init: float = 0.008
    mlp_color_lr_final: float = 0.00005
    mlp_color_lr_delay_mult: float = 0.01
    mlp_color_lr_max_steps: int = 30_000
    mlp_featurebank_lr_init: float = 0.01    # arguments/__init__.py:135-138
    mlp_featurebank_lr_final: float = 0.00001
    mlp_featurebank_lr_delay_mult: float = 0.01
    mlp_featurebank_lr_max_steps: int = 30_000
    crossattn_lr_init: float = 0.002     # run.py: --crossattn_lr_init 0.002
    crossattn_lr_final: float = 0.00002  # run.py: --crossattn_lr_final 2e-5
    crossattn_lr_delay_mult: float = 0.01
    crossattn_lr_max_steps: int = 30_000
    lambda_dssim: float = 0.2
    # selective mixed precision for the RGB loss head (L1 + SSIM maps run
    # in bf16, reductions accumulate f32; depth's scale/shift fit and the
    # whole render path stay fp32 — see gscream_tpu/precision.py for why
    # blanket bf16 is unsafe).  "float32" (default) is bit-identical to
    # round 1.
    loss_dtype: str = "float32"
    # densification schedule (run.py: start_stat 500, update 1500→15000/100)
    start_stat: int = 500
    update_from: int = 1_500
    update_interval: int = 100
    update_until: int = 15_000
    min_opacity: float = 0.005
    success_threshold: float = 0.8
    densify_grad_threshold: float = 0.0002
    # loss weights — defaults are the PAPER RUN values from the reference
    # driver (scripts/run.py:47-57), not the argparse defaults of
    # arguments/__init__.py (which the reference always overrides): the
    # fg-emphasis terms (rgb 20×, depth 100×) are the core of the removal
    # objective and the other-view depth terms run at 0.1.
    refer_rgb_lr: float = 1.0
    refer_rgb_lr_fg: float = 20.0
    other_rgb_lr: float = 1.0
    other_rgb_lr_fg: float = 0.0
    refer_depth_lr: float = 1.0
    refer_depth_lr_fg: float = 100.0
    refer_depth_lr_smooth: float = 1.0
    other_depth_lr: float = 0.1
    other_depth_lr_smooth: float = 0.1
    # cross-attention (run.py:62-79)
    enable_crossattn_refview: float = 1.0
    enable_crossattn_otherview: float = 1.0
    start_crossattn_from: int = 15_000
    attn_head_num: int = 8
    attn_head_dim: int = 64
    crossattn_feat_update_ema: float = 0.03   # run.py:77
    enable_pe: float = 0.0
    enable_edge_samping: float = 1.0
    sampling_2D_small_ratio: float = 0.6
    crossattn_max_tokens: int = 2000          # train.py:499-501 cap


@dataclass(frozen=True)
class PipelineConfig:
    """arguments/__init__.py:86-91 + TPU execution knobs."""
    white_background: bool = False
    # TPU execution
    interpret: Optional[bool] = None      # None → auto by backend
    mesh_data: int = 1                    # data-parallel axis size
    mesh_tiles: int = 1                   # tile-parallel axis size
    parity_fp32: bool = True              # strict fp32 matmuls


@dataclass(frozen=True)
class RunConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    test_iterations: Tuple[int, ...] = (3_000, 7_000, 30_000)
    save_iterations: Tuple[int, ...] = (30_000,)
    seed: int = 0


def to_json(cfg: RunConfig) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def from_json(text: str) -> RunConfig:
    d = json.loads(text)
    return RunConfig(
        model=ModelConfig(**d["model"]),
        optim=OptimConfig(**d["optim"]),
        pipeline=PipelineConfig(**d["pipeline"]),
        test_iterations=tuple(d.get("test_iterations", (3000, 7000, 30000))),
        save_iterations=tuple(d.get("save_iterations", (30000,))),
        seed=d.get("seed", 0),
    )


def save_config(cfg: RunConfig, path: str) -> None:
    with open(path, "w") as f:
        f.write(to_json(cfg))


def load_config(path: str) -> RunConfig:
    with open(path) as f:
        return from_json(f.read())
