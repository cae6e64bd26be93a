"""Config system: attribute-dict configs loaded from .py or .yaml files with
recursive `_base_` inheritance and `_cover_` subtree replacement.

Behavioral mirror of the reference config loader
(`python/jdet/config/config.py`): a `.py` config is imported and its
non-dunder module globals become the dict (config.py:38-54); `_base_` may be
a string or list of parent files merged in order (config.py:64-76);
a dict carrying `_cover_: True` replaces the parent subtree instead of
merging into it (config.py:78-101); `name` defaults to the config filename
stem and `work_dir` to `exp/<name>` (auto defaults); a module-global
singleton is exposed through init_cfg/get_cfg/update_cfg (config.py:146-165).
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

import yaml


class Config(dict):
    """dict with attribute access, recursively wrapping nested dicts."""

    def __init__(self, d=None, **kw):
        super().__init__()
        d = dict(d or {}, **kw)
        for k, v in d.items():
            self[k] = v

    def __setitem__(self, k, v):
        super().__setitem__(k, _wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            return None

    def dump(self):
        return _unwrap(self)

    def copy(self):
        return Config(_unwrap(self))


def _wrap(v):
    if isinstance(v, dict) and not isinstance(v, Config):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def _unwrap(v):
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return type(v)(_unwrap(x) for x in v)
    return v


def _load_py_dict(filename):
    """Execute a .py config module; non-dunder globals become the dict."""
    name = "_jdet_cfg_" + os.path.basename(filename).replace(".", "_")
    spec = importlib.util.spec_from_file_location(name, filename)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
        out = {
            k: v
            for k, v in vars(mod).items()
            if not k.startswith("__") and not isinstance(v, types.ModuleType)
        }
    finally:
        sys.modules.pop(name, None)
    return out


def _load_raw(filename):
    if filename.endswith((".yml", ".yaml")):
        with open(filename) as f:
            return yaml.safe_load(f) or {}
    if filename.endswith(".py"):
        return _load_py_dict(filename)
    raise ValueError(f"unsupported config type: {filename}")


def merge_dict_b2a(a, b):
    """Merge child dict b over parent dict a, in place on a.

    Mirrors merge semantics of the reference (config.py:78-101): dicts merge
    recursively unless the child subtree sets `_cover_` truthy, in which
    case it replaces the parent subtree; non-dict values overwrite.
    """
    for k, v in b.items():
        if k == "_cover_":
            continue
        if (
            k in a
            and isinstance(a[k], dict)
            and isinstance(v, dict)
            and not v.get("_cover_", False)
        ):
            merge_dict_b2a(a[k], v)
        else:
            a[k] = _strip_cover(v)
    return a


def _strip_cover(v):
    if isinstance(v, dict):
        return {k: _strip_cover(x) for k, x in v.items() if k != "_cover_"}
    if isinstance(v, (list, tuple)):
        return type(v)(_strip_cover(x) for x in v)
    return v


def load_cfg_file(filename):
    """Load one config file, resolving its `_base_` chain recursively."""
    filename = os.path.abspath(filename)
    raw = _load_raw(filename)
    bases = raw.pop("_base_", None)
    if bases is None:
        return _strip_cover(raw)
    if isinstance(bases, str):
        bases = [bases]
    merged = {}
    for b in bases:
        base_file = b if os.path.isabs(b) else os.path.join(
            os.path.dirname(filename), b
        )
        merge_dict_b2a(merged, load_cfg_file(base_file))
    merge_dict_b2a(merged, raw)
    return merged


_cfg = Config()


def init_cfg(filename=None):
    """Load `filename` into the global config singleton; set `name` and
    `work_dir` defaults from the filename (reference config.py:146-160)."""
    global _cfg
    _cfg = Config()
    if filename is None:
        return _cfg
    d = load_cfg_file(filename)
    _cfg = Config(d)
    if _cfg.get("name") is None:
        _cfg["name"] = os.path.splitext(os.path.basename(filename))[0]
    if _cfg.get("work_dir") is None:
        _cfg["work_dir"] = os.path.join("exp", _cfg["name"])
    return _cfg


def get_cfg():
    return _cfg


def update_cfg(**kw):
    _cfg.update(kw)
    return _cfg


def save_cfg(path=None):
    """Dump the global config to yaml (work_dir/config.yaml by default)."""
    cfg = get_cfg()
    if path is None:
        os.makedirs(cfg["work_dir"], exist_ok=True)
        path = os.path.join(cfg["work_dir"], "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg.dump(), f, default_flow_style=False)
    return path


def print_cfg():
    print(yaml.safe_dump(get_cfg().dump(), default_flow_style=False))
