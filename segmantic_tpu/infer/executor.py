"""Packed-layout inference executor: the eval forward as one fused graph.

TPU-native replacement for running the flax module graph at inference
(reference wraps MONAI's UNet and calls it unmodified for eval,
src/segmantic/seg/monai_unet.py:350-397, 637-639). At eval time the graph
is static and norm statistics are constants, which unlocks three
rewrites the training forward cannot do:

- **BatchNorm folding**: eval BN is an affine map per channel; it folds
  into the convolution epilogue (``y = (conv(x)+bias)*s + t`` with
  ``s = gamma/sqrt(var+eps)``, ``t = beta - mean*s``) so no separate
  normalization pass ever touches HBM.
- **Packed-layout persistence**: stride-1 3^3 conv chains (the residual
  units) run on the batch-packed ``(D, H, W, B*C)`` layout of
  :mod:`segmantic_tpu.ops.pallas_conv` — pack once per unit, run every
  conv with its folded norm + PReLU *inside* the Pallas kernel, add the
  residual in packed space, unpack once. Per-op routing loses to XLA's
  fusion (the pack/unpack transposes eat the kernel win; measured r2);
  persistence is what makes the kernel pay in-model.
- **Tiny-C strided rewrites**: the space-to-depth stem and subpixel head
  (:mod:`segmantic_tpu.ops.fast_conv`) apply as in training.

`make_eval_forward` mirrors `UNet.__call__`'s module-construction order
exactly (flax auto-naming: encoder ResidualUnit_0..L, decoder
ConvUnit_j / ResidualUnit_{L+1+j}), reads the param tree by those names,
and returns a jitted ``(variables, windows) -> f32 logits`` with the same
signature as the plain val forward. Equivalence with ``module.apply`` is
test-pinned (tests/infer/test_executor.py). Falls back to ``module.apply``
for configurations it does not rewrite (2D, INSTANCE/GROUP norm).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.unet import UNet
from ..ops import fast_conv, pallas_conv

_BN_EPS = 1e-5


def executor_supported(module: UNet) -> bool:
    """Can `make_eval_forward` rewrite this configuration?

    3D, kernel 3, BATCH (foldable) or NONE norm. Other configs fall back
    to ``module.apply`` (still correct, just not rewritten).
    """
    return (
        isinstance(module, UNet)
        and module.spatial_dims == 3
        and module.kernel_size == 3
        and module.up_kernel_size == 3
        and module.norm.upper() in ("BATCH", "NONE")
        and module.act.upper() in ("PRELU", "RELU")
    )


def executor_enabled() -> bool:
    """SEGMANTIC_EVAL_EXECUTOR = on (default) | off."""
    return os.environ.get("SEGMANTIC_EVAL_EXECUTOR", "on").lower() not in (
        "0", "off", "false",
    )


def _packed_eval_max() -> int:
    """Lane-packing win region for the eval chain (B*C upper bound).

    Measured v5e (exp/executor_ab.py): B*C <= 128 wins, 256 loses to
    XLA's eval fusion. Env-tunable for probing."""
    return int(os.environ.get("SEGMANTIC_PACKED_EVAL_MAX", "128"))


def _packed_eval_ok(x_shape, c_out, interpret: bool) -> bool:
    """Route this stride-1 conv through the packed kernel chain?"""
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    b, c = x_shape[0], x_shape[-1]
    limit = _packed_eval_max()
    if b * c > limit or b * c_out > limit:
        return False
    return pallas_conv.supported(tuple(x_shape), c_out)


def _fold_norm(cu_params: Dict[str, Any], cu_stats: Dict[str, Any]):
    """Eval-BN as per-channel (scale, shift) on the conv output; identity
    (None, None) when the unit has no norm parameters (norm='NONE')."""
    norm = cu_params.get("Norm_0")
    if not norm:
        return None, None
    bn = norm["BatchNorm_0"]
    st = cu_stats["Norm_0"]["BatchNorm_0"]
    s = bn["scale"] / jnp.sqrt(st["var"] + _BN_EPS)
    t = bn["bias"] - st["mean"] * s
    return s, t


def _apply_epilogue(y, s, t, alpha, act: str):
    """XLA epilogue: folded norm + activation (for non-packed convs)."""
    if s is not None:
        y = y * s.astype(y.dtype) + t.astype(y.dtype)
    if act == "PRELU":
        y = jnp.where(y >= 0, y, alpha.astype(y.dtype) * y)
    elif act == "RELU":
        y = jnp.maximum(y, 0)
    return y


def _conv_xla(x, kernel, bias, strides: int):
    """Plain conv with the same fast-path gates as DispatchConv3D."""
    nd = x.ndim - 2
    k = kernel.astype(x.dtype)
    if fast_conv.s2d_eligible(x.shape, kernel.shape[:nd], (strides,) * nd):
        return fast_conv.s2d_conv(x, k, bias)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(strides,) * nd, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + bias.astype(y.dtype)


def _conv_transpose(x, kernel, bias, strides: int):
    """Transposed conv with the subpixel fast path (as the flax module)."""
    nd = x.ndim - 2
    k = kernel.astype(x.dtype)
    ksp = kernel.shape[:nd]
    if fast_conv.subpixel_eligible(x.shape, kernel.shape[-1], ksp,
                                   (strides,) * nd):
        return fast_conv.subpixel_conv_transpose(x, k, bias)
    y = jax.lax.conv_transpose(
        x, k, strides=(strides,) * nd, padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + bias.astype(y.dtype)


def _conv_unit(x, p, st, *, strides: int, transposed: bool, conv_only: bool,
               act: str):
    """One ConvUnit in eval: conv/convT + folded norm + activation (XLA)."""
    if transposed:
        cp = p["ConvTranspose_0"]
        y = _conv_transpose(x, cp["kernel"], cp["bias"], strides)
    else:
        cp = p["Conv_0"]
        y = _conv_xla(x, cp["kernel"], cp["bias"], strides)
    if conv_only:
        return y
    s, t = _fold_norm(p, st)
    alpha = p.get("PReLU_0", {}).get("alpha")
    return _apply_epilogue(y, s, t, alpha, act)


def _packed_conv_unit(yp, batch, p, st, *, conv_only: bool, act: str,
                      interpret: bool, dtype):
    """One stride-1 ConvUnit on the packed layout: Pallas conv with the
    folded norm + activation fused into the kernel epilogue."""
    cp = p["Conv_0"]
    if conv_only:
        s = t = alpha = None
        relu_mode = "none"
    else:
        s, t = _fold_norm(p, st)
        alpha = p.get("PReLU_0", {}).get("alpha")
        relu_mode = {"PRELU": "prelu", "RELU": "relu"}.get(act, "none")
    return pallas_conv.conv3d_packed_p(
        yp, batch, pallas_conv.pack_weights(cp["kernel"], batch, dtype),
        bias=cp["bias"], scale=s, shift=t, alpha=alpha,
        relu_mode=relu_mode, out_dtype=dtype, interpret=interpret,
    )


def _residual_unit(x, p, st, *, feats: int, strides: int, subunits: int,
                   last_conv_only: bool, act: str, interpret: bool):
    """ResidualUnit in eval, packing the stride-1 conv chain when eligible."""
    subunits = max(1, subunits)
    batch = x.shape[0]

    # shortcut (projection only when shape/channels change — flax tree has
    # a Conv_0 entry exactly in that case)
    residual = None
    if strides != 1 or x.shape[-1] != feats:
        sp = p["Conv_0"]
        cu0 = p["ConvUnit_0"]["Conv_0"]
        if (strides != 1 and sp["kernel"].shape == cu0["kernel"].shape):
            # strided projection reads the SAME input with the SAME kernel
            # geometry as the first subunit's conv: run ONE conv with the
            # output channels concatenated (one patch pass, denser lanes),
            # then split
            kcat = jnp.concatenate([cu0["kernel"], sp["kernel"]], axis=-1)
            bcat = jnp.concatenate([cu0["bias"], sp["bias"]])
            both = _conv_xla(x, kcat, bcat, strides)
            y0, residual = both[..., :feats], both[..., feats:]
            s, t = _fold_norm(p["ConvUnit_0"], st.get("ConvUnit_0", {}))
            alpha = p["ConvUnit_0"].get("PReLU_0", {}).get("alpha")
            conv_only0 = last_conv_only and subunits == 1
            if not conv_only0:
                y0 = _apply_epilogue(y0, s, t, alpha, act)
            x0, start = y0, 1
        else:
            residual = _conv_xla(x, sp["kernel"], sp["bias"], strides)
            x0, start = x, 0
    else:
        residual = x
        x0, start = x, 0

    y = x0
    i = start
    while i < subunits:
        s_i = strides if i == 0 else 1
        cur_c = y.shape[-1]
        if s_i == 1 and _packed_eval_ok(y.shape, feats, interpret):
            # contiguous run of packed-eligible stride-1 subunits from i:
            # pack once, every conv fuses its folded norm + activation into
            # the kernel epilogue, channels are `feats` after the first
            run_start = i
            xp0 = pallas_conv.pack_batch(y)
            yp = xp0
            bdhw = y.shape[:-1]
            while i < subunits and _packed_eval_ok(
                bdhw + (cur_c,), feats, interpret
            ):
                yp = _packed_conv_unit(
                    yp, batch, p[f"ConvUnit_{i}"], st.get(f"ConvUnit_{i}", {}),
                    conv_only=last_conv_only and i == subunits - 1, act=act,
                    interpret=interpret, dtype=y.dtype,
                )
                cur_c = feats
                i += 1
            if i == subunits and run_start == 0 and residual is x:
                # identity residual over a fully-packed unit: add in packed
                # space (xp0 IS packed x), one unpack total
                return pallas_conv.unpack_batch(yp + xp0, batch)
            y = pallas_conv.unpack_batch(yp, batch)
        else:
            y = _conv_unit(
                y, p[f"ConvUnit_{i}"], st.get(f"ConvUnit_{i}", {}),
                strides=s_i, transposed=False,
                conv_only=last_conv_only and i == subunits - 1, act=act,
            )
            i += 1
    return y + residual.astype(y.dtype)


def _phase_stage_ok(module: UNet, x_shape, c_out: int, strides: int) -> bool:
    """Fuse a decoder (convT + residual-unit) stage entirely in subpixel
    phase space? Delegates to the flax graph's own gate
    (models/unet.py::phase_stage_ok) so the executor rewrites exactly the
    stages module.apply phase-runs."""
    from ..models.unet import phase_stage_ok

    return phase_stage_ok(
        len(x_shape) - 2, c_out, strides,
        num_res_units=module.num_res_units, dropout=module.dropout,
        kernel_size=module.kernel_size, up_kernel_size=module.up_kernel_size,
    )


def _phase_stage(x, p_cu, st_cu, p_ru, st_ru, *, feats: int, subunits: int,
                 last_conv_only: bool, act: str):
    """Top decoder stage without ever materializing the full-resolution
    grid: the subpixel convT's phase tensor (B, *S, 2^nd*feats) carries the
    2x-upsampled volume; folded norm, PReLU, the 3^3 residual convs and the
    identity add all run phase-major at input resolution (dense lanes,
    ~2^nd x fewer conv positions), with ONE depth-to-space at the end.

    Exact by the s2d/d2s conv identities (ops/fast_conv.py); the measured
    alternative — packed Pallas convs at the full-resolution grid — loses
    to this by >2x on v5e because tiny-C 3D convs at 96^3 are im2col-bound
    no matter the kernel (exp/exec_stages.py: the stage was 23 ms of a
    34 ms eval forward)."""
    nd = x.ndim - 2

    # transposed ConvUnit in phase space
    cp = p_cu["ConvTranspose_0"]
    ph = fast_conv.subpixel_phase_conv(x, cp["kernel"].astype(x.dtype))
    ph = ph + fast_conv.tile_phase(cp["bias"], nd).astype(ph.dtype)
    s, t = _fold_norm(p_cu, st_cu)
    alpha = p_cu.get("PReLU_0", {}).get("alpha")
    ph = _apply_epilogue(
        ph,
        None if s is None else fast_conv.tile_phase(s, nd),
        None if t is None else fast_conv.tile_phase(t, nd),
        alpha, act,
    )

    # residual unit: identity shortcut (phase add), 3^3 convs in block space.
    # Single conv-only subunit (the flagship top): the identity residual
    # folds into the conv kernel's center tap — out = conv(ph, w+Iδ)+bias —
    # so the stage is literally one conv + one depth-to-space.
    n_sub = max(1, subunits)
    fold_identity = n_sub == 1 and last_conv_only
    yp = ph
    for i in range(n_sub):
        cu_p = p_ru[f"ConvUnit_{i}"]
        cu_st = st_ru.get(f"ConvUnit_{i}", {})
        cp = cu_p["Conv_0"]
        k = cp["kernel"].astype(yp.dtype)
        if fold_identity:
            center = (1,) * nd
            eye = jnp.eye(feats, dtype=k.dtype)
            k = k.at[center].add(eye)
        yp = fast_conv.phase_conv_s1(yp, k)
        yp = yp + fast_conv.tile_phase(cp["bias"], nd).astype(yp.dtype)
        if not (last_conv_only and i == n_sub - 1):
            s, t = _fold_norm(cu_p, cu_st)
            alpha = cu_p.get("PReLU_0", {}).get("alpha")
            yp = _apply_epilogue(
                yp,
                None if s is None else fast_conv.tile_phase(s, nd),
                None if t is None else fast_conv.tile_phase(t, nd),
                alpha, act,
            )
    if not fold_identity:
        yp = yp + ph
    return fast_conv.depth_to_space(yp, feats)


def make_eval_forward(module: UNet, compute_dtype=jnp.bfloat16,
                      interpret: bool = False):
    """Jitted eval forward ``(variables, windows) -> f32 logits``.

    Numerically equivalent to ``module.apply(variables, w.astype(dtype),
    training=False)`` (folded-norm rounding differences are below bf16
    resolution; test-pinned). Same signature as
    :func:`segmantic_tpu.train.trainer.make_val_forward`, which delegates
    here when the configuration is supported.
    """
    if not executor_supported(module):
        @jax.jit
        def fallback(variables, windows):
            out = module.apply(
                variables, windows.astype(compute_dtype), training=False
            )
            return out.astype(jnp.float32)

        return fallback

    channels = tuple(module.channels)
    strides = tuple(module.strides)
    nres = module.num_res_units
    act = module.act.upper()

    def forward(params, stats, x):
        # mirror UNet.__call__'s flax auto-naming: per-type creation order
        counters = {"ResidualUnit": 0, "ConvUnit": 0}

        def take(kind):
            name = f"{kind}_{counters[kind]}"
            counters[kind] += 1
            return params[name], stats.get(name, {})

        def down(y, feats, s):
            if nres > 0:
                p, t = take("ResidualUnit")
                return _residual_unit(
                    y, p, t, feats=feats, strides=s, subunits=nres,
                    last_conv_only=False, act=act, interpret=interpret,
                )
            p, t = take("ConvUnit")
            return _conv_unit(y, p, t, strides=s, transposed=False,
                              conv_only=False, act=act)

        skips = []
        y = x
        for c, s in zip(channels[:-1], strides):
            y = down(y, c, s)
            skips.append(y)
        y = down(y, channels[-1], 1)

        for level in reversed(range(len(strides))):
            y = jnp.concatenate([skips[level], y], axis=-1)
            is_top = level == 0
            feats = module.out_channels if is_top else channels[level - 1]
            p, t = take("ConvUnit")
            if _phase_stage_ok(module, y.shape, feats, strides[level]):
                p2, t2 = take("ResidualUnit")
                y = _phase_stage(
                    y, p, t, p2, t2, feats=feats, subunits=1,
                    last_conv_only=is_top, act=act,
                )
                continue
            y = _conv_unit(
                y, p, t, strides=strides[level], transposed=True,
                conv_only=is_top and nres == 0, act=act,
            )
            if nres > 0:
                p, t = take("ResidualUnit")
                y = _residual_unit(
                    y, p, t, feats=feats, strides=1, subunits=1,
                    last_conv_only=is_top, act=act, interpret=interpret,
                )
        return y

    @jax.jit
    def eval_forward(variables, windows):
        out = forward(
            variables["params"], variables.get("batch_stats", {}),
            windows.astype(compute_dtype),
        )
        return out.astype(jnp.float32)

    return eval_forward
