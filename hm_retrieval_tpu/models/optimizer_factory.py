"""Optimizer registry (ref: pkg/modelling/optimizer_factory.py:8-57).

The reference restricts itself to legacy Keras Adam/Adagrad for speed
(ref: optimizer_factory.py:14-18); the TPU-native equivalents are the optax
transforms, which XLA fuses into the update step. Same contract: name
lookup + mandatory ``learning_rate`` kwarg
(ref: optimizer_factory.py:20,49-53).

Adagrad note: Keras legacy Adagrad uses ``initial_accumulator_value=0.1``
and ``epsilon=1e-7`` by default — mirrored here so reproduced reference
runs match.
"""

from __future__ import annotations

from typing import Dict

import optax


def _adagrad(learning_rate: float, **kw) -> optax.GradientTransformation:
    kw.setdefault("initial_accumulator_value", 0.1)
    kw.setdefault("eps", 1e-7)
    return optax.adagrad(learning_rate, **kw)


def _adam(learning_rate: float, **kw) -> optax.GradientTransformation:
    return optax.adam(learning_rate, **kw)


_REGISTRY = {
    "adagrad": _adagrad,
    "adam": _adam,
}


class OptimizerFactory:
    @staticmethod
    def get_optimizer(
        name: str, optimizer_kwargs: Dict
    ) -> optax.GradientTransformation:
        key = name.lower()
        if key not in _REGISTRY:
            raise ValueError(
                f"unknown optimizer {name!r}; supported: "
                f"{sorted(_REGISTRY)}"
            )
        if "learning_rate" not in optimizer_kwargs:
            raise ValueError(
                "optimizer_kwargs must include learning_rate"
            )
        return _REGISTRY[key](**optimizer_kwargs)
