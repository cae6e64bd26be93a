"""Name -> class registries + recursive config-driven builder.

Behavioral mirror of the reference registry
(`python/jdet/utils/registry.py:1-63`): `Registry.register_module`
decorates a class (or function) into a name table; `build_from_cfg`
accepts a string (no-arg construct), a dict with a `type` key (popped,
rest become kwargs), or a list (each element built, combined by the
caller). The same 14 registry names are exposed.
"""
from __future__ import annotations


class Registry:
    def __init__(self, name):
        self.name = name
        self._modules = {}

    def register_module(self, cls=None, name=None):
        def _register(c):
            key = name or c.__name__
            if key in self._modules:
                raise KeyError(f"{key} already registered in {self.name}")
            self._modules[key] = c
            return c

        if cls is not None:
            return _register(cls)
        return _register

    def get(self, key):
        if key not in self._modules:
            raise KeyError(
                f"{key} not registered in {self.name}; "
                f"known: {sorted(self._modules)}"
            )
        return self._modules[key]

    def __contains__(self, key):
        return key in self._modules

    def keys(self):
        return self._modules.keys()


def build_from_cfg(cfg, registry, **default_kwargs):
    """Build an object from config (reference registry.py:24-46).

    str -> no-arg construction; dict -> pop `type`, rest are kwargs merged
    over `default_kwargs`; list -> list of built objects; None -> None.
    """
    if cfg is None:
        return None
    if isinstance(cfg, str):
        return registry.get(cfg)(**default_kwargs)
    if isinstance(cfg, (list, tuple)):
        return [build_from_cfg(c, registry, **default_kwargs) for c in cfg]
    if isinstance(cfg, dict):
        args = dict(cfg)
        obj_type = args.pop("type")
        kwargs = {**default_kwargs, **args}
        return registry.get(obj_type)(**kwargs)
    raise TypeError(f"cannot build from {type(cfg)}")


DATASETS = Registry("DATASETS")
TRANSFORMS = Registry("TRANSFORMS")
MODELS = Registry("MODELS")
BACKBONES = Registry("BACKBONES")
HEADS = Registry("HEADS")
LOSSES = Registry("LOSSES")
OPTIMS = Registry("OPTIMS")
BRICKS = Registry("BRICKS")
NECKS = Registry("NECKS")
SCHEDULERS = Registry("SCHEDULERS")
BOXES = Registry("BOXES")
HOOKS = Registry("HOOKS")
ROI_EXTRACTORS = Registry("ROI_EXTRACTORS")
SHARED_HEADS = Registry("SHARED_HEADS")
