"""Numeric-debug mode (SURVEY §5.2: the rebuild's sanitizer analog).

The reference has no sanitizers (single-threaded by construction); the
JAX-native equivalents are NaN trapping and disabled fusion for readable
failures. Enable for test/debug runs only — both cost performance.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def enable_debug_checks(nans: bool = True, disable_jit: bool = False):
    """Turn on jax_debug_nans (raises at the op producing a NaN) and
    optionally disable jit for step-through debugging."""
    if nans:
        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled")
    if disable_jit:
        jax.config.update("jax_disable_jit", True)
        logger.info("jax_disable_jit enabled")


def disable_debug_checks():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_disable_jit", False)
