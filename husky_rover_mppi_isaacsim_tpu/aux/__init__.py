"""Auxiliary subsystems: config, stellar lighting, SDG labeling, profiling."""

from ..utils.timer import ScopedTimer, timed
from .config import (
    ConfigFactory,
    apply_overrides,
    default_factory,
    instantiate_configs,
    load_config,
)
from .labeling import (
    AutonomousLabeling,
    LabelingConf,
    hillshade,
    instance_mask,
    semantic_mask,
    surface_normals,
)
from .stellar import Date, StellarEngine, StellarEngineConf

__all__ = [
    "ScopedTimer",
    "timed",
    "ConfigFactory",
    "apply_overrides",
    "default_factory",
    "instantiate_configs",
    "load_config",
    "AutonomousLabeling",
    "LabelingConf",
    "hillshade",
    "instance_mask",
    "semantic_mask",
    "surface_normals",
    "Date",
    "StellarEngine",
    "StellarEngineConf",
]
