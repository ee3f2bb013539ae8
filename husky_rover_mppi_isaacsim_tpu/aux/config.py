"""Configuration system: YAML + dotted overrides -> registered dataclasses.

Replaces the reference's Hydra/OmegaConf pipeline (run.py:30-73
``omegaconfToDict`` + ``instantiateConfigs`` + configFactory and the
``src/configurations/*`` dataclasses): a plain-YAML tree is composed with
``key=value`` dot-list overrides (the Hydra CLI syntax documented in
wiki/modes/Modes.md) and instantiated into the framework's validating
dataclasses through a name registry.
"""

from __future__ import annotations

import dataclasses
import typing
from pathlib import Path

import yaml


class ConfigFactory:
    """Name -> dataclass registry (run.py:56-73 configFactory)."""

    def __init__(self):
        self._registry: dict[str, type] = {}

    def register(self, name: str, cls: type) -> None:
        self._registry[name] = cls

    def __contains__(self, name: str) -> bool:
        return name in self._registry

    def instantiate(self, name: str, data: dict):
        if name not in self._registry:
            raise ValueError(f"Unknown configuration: {name}")
        return _build_dataclass(self._registry[name], data)


def _build_dataclass(cls, data):
    """Recursively build a dataclass from a dict, instantiating nested
    dataclass fields (the reference's __post_init__ expansion pattern,
    src/configurations/environments.py:126-290)."""
    if data is None:
        return cls()
    if not dataclasses.is_dataclass(cls):
        if hasattr(cls, "_fields"):  # NamedTuple configs (e.g. RoverParams)
            if isinstance(data, dict):
                unknown = set(data) - set(cls._fields)
                if unknown:
                    raise ValueError(
                        f"{cls.__name__}: unknown keys {sorted(unknown)}")
                return cls(**data)
            return data
        return data
    hints = typing.get_type_hints(cls)
    kwargs = {}
    for field in dataclasses.fields(cls):
        if field.name not in data:
            continue
        value = data[field.name]
        ftype = hints.get(field.name, field.type)
        if dataclasses.is_dataclass(ftype) and isinstance(value, dict):
            kwargs[field.name] = _build_dataclass(ftype, value)
        elif hasattr(ftype, "_fields") and isinstance(value, dict):
            kwargs[field.name] = ftype(**value)  # NamedTuple configs
        elif isinstance(value, list):
            kwargs[field.name] = tuple(value) if _wants_tuple(ftype) else value
        else:
            kwargs[field.name] = value
    unknown = set(data) - {f.name for f in dataclasses.fields(cls)}
    if unknown:
        raise ValueError(f"{cls.__name__}: unknown keys {sorted(unknown)}")
    return cls(**kwargs)


def _wants_tuple(ftype) -> bool:
    origin = typing.get_origin(ftype)
    return ftype in (tuple,) or origin is tuple


def apply_overrides(tree: dict, overrides: list[str]) -> dict:
    """Hydra-style ``a.b.c=value`` dot-list overrides."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        key, _, raw = item.partition("=")
        value = yaml.safe_load(raw)
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def load_config(path: str | Path, overrides: list[str] | None = None) -> dict:
    """Load a YAML tree, resolve ``defaults:`` includes relative to the
    file (single-level Hydra-style composition), apply overrides."""
    path = Path(path)
    with open(path) as fh:
        tree = yaml.safe_load(fh) or {}
    defaults = tree.pop("defaults", [])
    merged: dict = {}
    for entry in defaults:
        if isinstance(entry, dict):
            (group, name), = entry.items()
            sub = load_config(path.parent / group / f"{name}.yaml")
            merged[group] = sub
        else:
            sub = load_config(path.parent / f"{entry}.yaml")
            merged.update(sub)
    merged.update(tree)
    if overrides:
        apply_overrides(merged, overrides)
    return merged


def default_factory() -> ConfigFactory:
    """Factory pre-loaded with the framework's config dataclasses."""
    from ..env.closed_loop import ClosedLoopConfig
    from ..env.rover_sim import RoverParams
    from ..mppi.controller import MPPIConfig
    from ..physics import PhysicsSceneConf
    from ..physics.deformation import DeformationEngineConf
    from ..physics.terramechanics import (
        RobotParameter,
        TerrainMechanicalParameter,
    )
    from ..terrain.craters import CraterSamplerConf
    from ..terrain.rocks import RockDistConf
    from ..terrain.streaming import StreamerConf
    from .stellar import StellarEngineConf

    factory = ConfigFactory()
    factory.register("mppi", MPPIConfig)
    factory.register("closed_loop", ClosedLoopConfig)
    factory.register("rover", RoverParams)
    factory.register("physics_scene", PhysicsSceneConf)
    factory.register("deformation_engine", DeformationEngineConf)
    factory.register("terramechanics_robot", RobotParameter)
    factory.register("terramechanics_terrain", TerrainMechanicalParameter)
    factory.register("crater_sampler", CraterSamplerConf)
    factory.register("rock_distribution", RockDistConf)
    factory.register("terrain_streamer", StreamerConf)
    factory.register("stellar_engine", StellarEngineConf)
    return factory


def instantiate_configs(tree: dict, factory: ConfigFactory | None = None) -> dict:
    """Instantiate every top-level key with a registered dataclass;
    unregistered keys pass through as dicts (run.py:56-73 semantics)."""
    factory = factory or default_factory()
    out = {}
    for key, value in tree.items():
        if key in factory and isinstance(value, (dict, type(None))):
            out[key] = factory.instantiate(key, value)
        else:
            out[key] = value
    return out
