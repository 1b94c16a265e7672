"""Optimizer factory + validation-epoch LR schedulers.

Config-dict surface matches the reference's zoo
(reference: src/segmantic/seg/monai_unet.py:292-337 and defaults at
:83-97): SGD / Adam / AdaBelief optimizers; Constant / ReduceOnPlateau /
Cosine(WarmRestarts) schedules stepped once per validation epoch
(reference: :375-379). TPU-shaped design: the schedule runs as a tiny host
state machine and feeds the learning rate into the jitted train step as a
traced scalar via ``optax.inject_hyperparams`` — no recompiles on LR change.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import optax

DEFAULT_OPTIMIZER: Dict[str, Any] = {
    "optimizer": "Adam",
    "lr": 1e-4,
    "momentum": 0.9,
    "epsilon": 1e-8,
    "amsgrad": False,
    "weight_decouple": False,
}

DEFAULT_LR_SCHEDULING: Dict[str, Any] = {
    "scheduler": "Constant",
    "factor": 0.5,
    "patience": 10,
    "T_0": 50,
    "T_multi": 1,
}


def make_optimizer(config: Optional[Dict[str, Any]] = None) -> optax.GradientTransformation:
    """Build an optax optimizer with an injectable ``learning_rate``."""
    cfg = dict(DEFAULT_OPTIMIZER)
    cfg.update(config or {})
    name = cfg["optimizer"]

    if name == "SGD":
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg["lr"], momentum=cfg["momentum"]
        )
    elif name == "Adam":
        if cfg.get("amsgrad", False):
            opt = optax.inject_hyperparams(optax.amsgrad)(learning_rate=cfg["lr"])
        else:
            opt = optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg["lr"], eps=cfg.get("epsilon", 1e-8)
            )
    elif name == "AdaBelief":
        opt = optax.inject_hyperparams(optax.adabelief)(
            learning_rate=cfg["lr"],
            b1=0.9,
            b2=0.999,
            eps=cfg.get("epsilon", 1e-8),
        )
    else:
        raise ValueError(f"unsupported optimizer {name!r}")
    return opt


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate inside an optax state (no recompile:
    the schedule feeds a traced scalar, not a new constant). Unwraps a
    gradient-accumulation ``MultiStepsState`` wrapper transparently."""
    import jax.numpy as jnp

    if isinstance(opt_state, optax.MultiStepsState):
        inner = set_learning_rate(opt_state.inner_opt_state, lr)
        return opt_state._replace(inner_opt_state=inner)
    current = opt_state.hyperparams["learning_rate"]
    dtype = getattr(current, "dtype", jnp.float32)
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=dtype)
    return opt_state


class LRScheduler:
    """Per-validation-epoch LR schedule state machine.

    ``step(val_loss)`` is called once per validation epoch and returns the
    new learning rate.
    """

    def __init__(self, base_lr: float, config: Optional[Dict[str, Any]] = None):
        cfg = dict(DEFAULT_LR_SCHEDULING)
        cfg.update(config or {})
        self.kind = cfg["scheduler"]
        self.base_lr = float(base_lr)
        self.factor = float(cfg.get("factor", 0.5))
        self.patience = int(cfg.get("patience", 10))
        self.t0 = int(cfg.get("T_0", 50))
        self.t_mult = int(cfg.get("T_multi", 1))
        self.lr = self.base_lr
        self._best = math.inf
        self._bad_epochs = 0
        self._epoch = 0
        if self.kind not in ("Constant", "ReduceOnPlateau", "Cosine"):
            raise ValueError(f"unsupported scheduler {self.kind!r}")

    def step(self, val_loss: Optional[float] = None) -> float:
        self._epoch += 1
        if self.kind == "Constant":
            return self.lr
        if self.kind == "ReduceOnPlateau":
            if val_loss is None:
                return self.lr
            if val_loss < self._best - 1e-8:
                self._best = val_loss
                self._bad_epochs = 0
            else:
                self._bad_epochs += 1
                if self._bad_epochs > self.patience:
                    self.lr *= self.factor
                    self._bad_epochs = 0
            return self.lr
        # CosineAnnealingWarmRestarts (eta_min = 0)
        if self.t_mult <= 1:
            period = self.t0
            t = self._epoch % period
        else:
            t, period = self._epoch, self.t0
            while t >= period:
                t -= period
                period *= self.t_mult
        self.lr = 0.5 * self.base_lr * (1 + math.cos(math.pi * t / period))
        return self.lr
