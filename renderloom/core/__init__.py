"""Core infrastructure: config, registry, checkpointing, logging, PRNG."""

from renderloom.core.config import (  # noqa: F401
    MotionConfig,
    RendererConfig,
    load_motion_config,
    load_renderer_config,
    motion_config_from_dict,
    renderer_config_from_dict,
)
from renderloom.core.registry import Registry  # noqa: F401
