"""Hydra-style configuration: YAML files + dotted CLI overrides.

The reference drives every trainer through hydra/OmegaConf
(rnn/conf/autoreg_LSTM.yaml, online_testing conf/config_single.yaml);
neither is installed here, so this is a small self-contained equivalent:
``load_config("conf/x.yaml", ["optimizer.lr=3e-4", "model.nh_mem=32"])``
returns a dot-accessible nested config. Option names follow the reference
YAMLs (mp_mode, rollout_schedule, loss weights w_hcon/w_wcon/..., nneur,
nh_mem, ensemble_size, optimizer, scheduler) for comparability
(SURVEY.md §7.1 design mapping).
"""
from __future__ import annotations

import ast
from typing import Any

import yaml


class Config(dict):
    """dict with attribute access and recursive wrapping."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) \
            else v

    def __setattr__(self, k, v):
        self[k] = v

    def to_dict(self) -> dict:
        def conv(v):
            return {k: conv(x) for k, x in v.items()} if isinstance(v, dict) \
                else v
        return conv(self)


def _parse_value(s: str) -> Any:
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _set_dotted(cfg: dict, key: str, value: Any):
    parts = key.split(".")
    d = cfg
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = value


def _merge(base: dict, over: dict):
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _merge(base[k], v)
        else:
            base[k] = v


def load_config(path: str | None = None, overrides: list[str] | None = None,
                defaults: dict | None = None) -> Config:
    """Load YAML + apply `a.b=c` overrides (values literal-eval'd)."""
    cfg: dict = dict(defaults or {})
    if path:
        with open(path) as f:
            _merge(cfg, yaml.safe_load(f) or {})
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override '{ov}' is not key=value")
        k, v = ov.split("=", 1)
        _set_dotted(cfg, k.strip(), _parse_value(v.strip()))
    return Config(cfg)


def save_config(cfg: Config, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
