"""pix2pix / CycleGAN training loops (jitted, data-parallel ready).

Rebuilds the style-transfer capability the reference documents but no
longer ships (SURVEY.md §2.8; BASELINE config #5 "T1→T2 pix2pix/CycleGAN
translation"): LSGAN objectives, L1 / cycle-consistency / identity terms,
alternating G/D optimization fused into one jitted step each, batches
sharded over the mesh 'data' axis.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import make_mesh, put_batch, replicate
from ..train.checkpoint import save_checkpoint
from .models import PatchDiscriminator, ResnetGenerator


def lsgan_loss(logits: jax.Array, is_real: bool) -> jax.Array:
    target = 1.0 if is_real else 0.0
    return jnp.mean((logits.astype(jnp.float32) - target) ** 2)


@dataclasses.dataclass
class I2IResult:
    generator_params: Dict
    history: List[Dict[str, float]]
    checkpoint: Optional[Path] = None


def _make_optim(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.5, b2=0.999)


def train_pix2pix(
    batches: Iterator[Tuple[np.ndarray, np.ndarray]],
    steps: int = 1000,
    lambda_l1: float = 100.0,
    lr: float = 2e-4,
    base_features: int = 64,
    n_blocks: int = 6,
    seed: int = 0,
    output_dir: Optional[Path] = None,
    log_every: int = 100,
    extra_hparams: Optional[Dict] = None,
) -> I2IResult:
    """Paired translation: generator(src) ≈ dst with LSGAN + L1.

    ``batches`` yields (source, target) channel-last arrays of identical
    static shapes.
    """
    src0, dst0 = next(iter_batches := iter(batches))
    mesh = make_mesh()

    gen = ResnetGenerator(out_channels=dst0.shape[-1], base_features=base_features,
                          n_blocks=n_blocks)
    disc = PatchDiscriminator(base_features=base_features)

    key = jax.random.key(seed)
    g_vars = gen.init(key, jnp.asarray(src0))
    d_vars = disc.init(key, jnp.concatenate([jnp.asarray(src0), jnp.asarray(dst0)], -1))
    g_params = replicate(mesh, g_vars["params"])
    d_params = replicate(mesh, d_vars["params"])

    g_opt = _make_optim(lr)
    d_opt = _make_optim(lr)
    g_state = replicate(mesh, g_opt.init(g_params))
    d_state = replicate(mesh, d_opt.init(d_params))

    @jax.jit
    def g_step(g_params, g_state, d_params, src, dst):
        def loss_fn(p):
            fake = gen.apply({"params": p}, src)
            pred = disc.apply({"params": d_params}, jnp.concatenate([src, fake], -1))
            adv = lsgan_loss(pred, True)
            l1 = jnp.mean(jnp.abs(fake.astype(jnp.float32) - dst))
            return adv + lambda_l1 * l1, (adv, l1)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(g_params)
        updates, g_state2 = g_opt.update(grads, g_state, g_params)
        return optax.apply_updates(g_params, updates), g_state2, loss, aux

    @jax.jit
    def d_step(d_params, d_state, g_params, src, dst):
        fake = jax.lax.stop_gradient(gen.apply({"params": g_params}, src))

        def loss_fn(p):
            real_pred = disc.apply({"params": p}, jnp.concatenate([src, dst], -1))
            fake_pred = disc.apply({"params": p}, jnp.concatenate([src, fake], -1))
            return 0.5 * (lsgan_loss(real_pred, True) + lsgan_loss(fake_pred, False))

        loss, grads = jax.value_and_grad(loss_fn)(d_params)
        updates, d_state2 = d_opt.update(grads, d_state, d_params)
        return optax.apply_updates(d_params, updates), d_state2, loss

    history: List[Dict[str, float]] = []
    src_b, dst_b = src0, dst0
    for step in range(steps):
        src_d = put_batch(mesh, src_b)
        dst_d = put_batch(mesh, dst_b)
        d_params, d_state, d_loss = d_step(d_params, d_state, g_params, src_d, dst_d)
        g_params, g_state, g_loss, (adv, l1) = g_step(
            g_params, g_state, d_params, src_d, dst_d
        )
        if step % log_every == 0 or step == steps - 1:
            rec = {
                "step": step,
                "g_loss": float(g_loss),
                "d_loss": float(d_loss),
                "l1": float(l1),
            }
            history.append(rec)
            print(f"pix2pix step {step}: g={rec['g_loss']:.4f} d={rec['d_loss']:.4f} l1={rec['l1']:.4f}")
        try:
            src_b, dst_b = next(iter_batches)
        except StopIteration:
            try:
                iter_batches = iter(batches)
                src_b, dst_b = next(iter_batches)
            except StopIteration:
                pass  # exhausted generator: keep reusing the last batch

    ckpt = None
    if output_dir:
        output_dir = Path(output_dir)
        ckpt = output_dir / "pix2pix_generator.ckpt"
        save_checkpoint(
            ckpt,
            {"params": jax.device_get(g_params)},
            hparams={
                "model": "pix2pix",
                "out_channels": dst0.shape[-1],
                "base_features": base_features,
                "n_blocks": n_blocks,
                **(extra_hparams or {}),
            },
            metrics=history[-1] if history else {},
        )
    return I2IResult(jax.device_get(g_params), history, ckpt)


def train_cyclegan(
    batches: Iterator[Tuple[np.ndarray, np.ndarray]],
    steps: int = 1000,
    lambda_cycle: float = 10.0,
    lambda_identity: float = 0.5,
    lr: float = 2e-4,
    base_features: int = 32,
    n_blocks: int = 4,
    seed: int = 0,
    output_dir: Optional[Path] = None,
    log_every: int = 100,
    extra_hparams: Optional[Dict] = None,
) -> I2IResult:
    """Unpaired translation: G_AB/G_BA + D_A/D_B with cycle + identity.

    ``batches`` yields (domain_A, domain_B) channel-last arrays (unpaired).
    """
    a0, b0 = next(iter_batches := iter(batches))
    mesh = make_mesh()

    gen_ab = ResnetGenerator(out_channels=b0.shape[-1], base_features=base_features, n_blocks=n_blocks)
    gen_ba = ResnetGenerator(out_channels=a0.shape[-1], base_features=base_features, n_blocks=n_blocks)
    disc_a = PatchDiscriminator(base_features=base_features)
    disc_b = PatchDiscriminator(base_features=base_features)

    k = jax.random.key(seed)
    params = {
        "gen_ab": gen_ab.init(k, jnp.asarray(a0))["params"],
        "gen_ba": gen_ba.init(k, jnp.asarray(b0))["params"],
        "disc_a": disc_a.init(k, jnp.asarray(a0))["params"],
        "disc_b": disc_b.init(k, jnp.asarray(b0))["params"],
    }
    params = replicate(mesh, params)
    g_opt, d_opt = _make_optim(lr), _make_optim(lr)
    g_state = replicate(mesh, g_opt.init({"gen_ab": params["gen_ab"], "gen_ba": params["gen_ba"]}))
    d_state = replicate(mesh, d_opt.init({"disc_a": params["disc_a"], "disc_b": params["disc_b"]}))

    @jax.jit
    def g_step(params, g_state, a, b):
        def loss_fn(gp):
            fake_b = gen_ab.apply({"params": gp["gen_ab"]}, a)
            fake_a = gen_ba.apply({"params": gp["gen_ba"]}, b)
            adv = lsgan_loss(disc_b.apply({"params": params["disc_b"]}, fake_b), True)
            adv += lsgan_loss(disc_a.apply({"params": params["disc_a"]}, fake_a), True)
            rec_a = gen_ba.apply({"params": gp["gen_ba"]}, fake_b)
            rec_b = gen_ab.apply({"params": gp["gen_ab"]}, fake_a)
            cyc = jnp.mean(jnp.abs(rec_a - a)) + jnp.mean(jnp.abs(rec_b - b))
            idt = jnp.mean(jnp.abs(gen_ab.apply({"params": gp["gen_ab"]}, b) - b))
            idt += jnp.mean(jnp.abs(gen_ba.apply({"params": gp["gen_ba"]}, a) - a))
            return adv + lambda_cycle * cyc + lambda_cycle * lambda_identity * idt, (adv, cyc)

        gp = {"gen_ab": params["gen_ab"], "gen_ba": params["gen_ba"]}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(gp)
        updates, g_state2 = g_opt.update(grads, g_state, gp)
        new_gp = optax.apply_updates(gp, updates)
        params2 = dict(params)
        params2.update(new_gp)
        return params2, g_state2, loss, aux

    @jax.jit
    def d_step(params, d_state, a, b):
        fake_b = jax.lax.stop_gradient(gen_ab.apply({"params": params["gen_ab"]}, a))
        fake_a = jax.lax.stop_gradient(gen_ba.apply({"params": params["gen_ba"]}, b))

        def loss_fn(dp):
            loss = lsgan_loss(disc_b.apply({"params": dp["disc_b"]}, b), True)
            loss += lsgan_loss(disc_b.apply({"params": dp["disc_b"]}, fake_b), False)
            loss += lsgan_loss(disc_a.apply({"params": dp["disc_a"]}, a), True)
            loss += lsgan_loss(disc_a.apply({"params": dp["disc_a"]}, fake_a), False)
            return 0.5 * loss

        dp = {"disc_a": params["disc_a"], "disc_b": params["disc_b"]}
        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, d_state2 = d_opt.update(grads, d_state, dp)
        new_dp = optax.apply_updates(dp, updates)
        params2 = dict(params)
        params2.update(new_dp)
        return params2, d_state2, loss

    history: List[Dict[str, float]] = []
    a_b, b_b = a0, b0
    for step in range(steps):
        a_d = put_batch(mesh, a_b)
        b_d = put_batch(mesh, b_b)
        params, d_state, d_loss = d_step(params, d_state, a_d, b_d)
        params, g_state, g_loss, (adv, cyc) = g_step(params, g_state, a_d, b_d)
        if step % log_every == 0 or step == steps - 1:
            rec = {
                "step": step,
                "g_loss": float(g_loss),
                "d_loss": float(d_loss),
                "cycle": float(cyc),
            }
            history.append(rec)
            print(f"cyclegan step {step}: g={rec['g_loss']:.4f} d={rec['d_loss']:.4f} cycle={rec['cycle']:.4f}")
        try:
            a_b, b_b = next(iter_batches)
        except StopIteration:
            try:
                iter_batches = iter(batches)
                a_b, b_b = next(iter_batches)
            except StopIteration:
                pass  # exhausted generator: keep reusing the last batch

    host = jax.device_get(params)
    ckpt = None
    if output_dir:
        output_dir = Path(output_dir)
        ckpt = output_dir / "cyclegan_generators.ckpt"
        save_checkpoint(
            ckpt,
            {"params": {"gen_ab": host["gen_ab"], "gen_ba": host["gen_ba"]}},
            hparams={
                "model": "cyclegan",
                "base_features": base_features,
                "n_blocks": n_blocks,
                "a_channels": a0.shape[-1],
                "b_channels": b0.shape[-1],
                **(extra_hparams or {}),
            },
            metrics=history[-1] if history else {},
        )
    return I2IResult({"gen_ab": host["gen_ab"], "gen_ba": host["gen_ba"]}, history, ckpt)
