"""Experiment configuration.

A typed dataclass `Config` plus a parser for the reference's INI-style
``configs/*.yml`` files (ConfigObj format, one ``[train]`` section;
reference: read_config.py:6-66, configs/config_parsenet.yml). Dependency-free:
we parse the tiny INI dialect ourselves instead of requiring configobj.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Optional


def _coerce(value: str) -> Any:
    v = value.strip().strip('"').strip("'")
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v


def parse_ini(path: str) -> Dict[str, Any]:
    """Parse the reference's ConfigObj-style file into a flat dict.

    Section headers are ignored (the reference uses a single [train] section);
    `#`-comments and blank lines are skipped.
    """
    out: Dict[str, Any] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or line.startswith("["):
                continue
            m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.*)", line)
            if m:
                out[m.group(1)] = _coerce(m.group(2))
    return out


@dataclasses.dataclass
class Config:
    """All trainer hyperparameters (reference: read_config.py:14-66).

    Field names match the reference config files so that the reference's
    configs/*.yml drop in unchanged.
    """

    comment: str = ""
    model_path: str = "model"
    dataset: str = ""
    preload_model: bool = False
    pretrain_model_path: str = ""
    normals: bool = False
    proportion: float = 1.0
    num_train: int = 0
    num_val: int = 0
    num_test: int = 0
    num_points: int = 700
    loss_weight: float = 0.9
    num_epochs: int = 100
    grid_size: int = 20
    batch_size: int = 8
    optim: str = "adam"
    accum: int = 1
    weight_decay: float = 0.0
    # dropout / encoder_drop / proportion are parsed-but-unused, exactly
    # mirroring the reference (its trainers never read them either —
    # read_config.py:63 parses accum, train_parsenet.py ignores it; see
    # SURVEY.md §5 config notes). Kept so the reference's configs/*.yml
    # round-trip without edits.
    dropout: float = 0.0
    lr: float = 1e-3
    encoder_drop: float = 0.0
    lr_sch: bool = True
    patience: int = 8
    mode: int = 0
    # --- TPU-native additions (not in the reference) ---
    seed: int = 0
    num_devices: int = 0          # 0 => use all local devices
    half_precision: bool = False  # bf16 matmuls in the networks
    # e2e trainer: use the quality-gated fast train step (FAST_STEP_KNOBS in
    # train_e2e.py — strided residual/spline/SIOU evaluation + cheap
    # mean-shift escalation attempts; gradient-cosine > 0.9 vs the default
    # graph, tests/test_train_knobs.py)
    fast_step: bool = False
    log_dir: str = "logs"
    # kNN neighbourhood (reference hardcodes nn_nb=80 for seg, 10 for splines)
    knn_k: int = 80

    @classmethod
    def from_file(cls, path: str) -> "Config":
        raw = parse_ini(path)
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in raw.items() if k in fields}
        return cls(**known)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def write(self, path: str) -> None:
        """Snapshot the config next to checkpoints (reference: read_config.py:68-76)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)


def load_config(path: Optional[str] = None, **overrides) -> Config:
    cfg = Config.from_file(path) if path else Config()
    return cfg.replace(**overrides) if overrides else cfg
