"""Analytic FLOP accounting for the bench MFU figure."""

import math

from segmantic_tpu.utils.flops import (
    augment_flops,
    flagship_step_flops,
    unet_fwd_flops,
)


def test_flagship_fwd_matches_hand_count():
    """Pin the per-sample forward count of the flagship topology against an
    independent layer-by-layer hand derivation (96^3, 1->8ch, 16..256)."""
    got = unet_fwd_flops((96, 96, 96), 1, 8)

    def conv(vox, k, ci, co):
        return 2.0 * vox * k**3 * ci * co

    v48, v24, v12, v6 = 48**3, 24**3, 12**3, 6**3
    v96 = 96**3
    hand = 0.0
    # encoder residual units (strided conv + conv + k3 shortcut)
    for vox, ci, co in [(v48, 1, 16), (v24, 16, 32), (v12, 32, 64), (v6, 64, 128)]:
        hand += conv(vox, 3, ci, co) + conv(vox, 3, co, co) + conv(vox, 3, ci, co)
    # bottom: stride-1 res unit with 1x1 projection
    hand += conv(v6, 3, 128, 256) + conv(v6, 3, 256, 256) + conv(v6, 1, 128, 256)
    # decoder: convT (input-voxel count) + one res subunit, identity shortcut
    hand += conv(v6, 3, 256 + 128, 64) + conv(v12, 3, 64, 64)
    hand += conv(v12, 3, 64 + 64, 32) + conv(v24, 3, 32, 32)
    hand += conv(v24, 3, 32 + 32, 16) + conv(v48, 3, 16, 16)
    hand += conv(v48, 3, 16 + 16, 8) + conv(v96, 3, 8, 8)
    assert math.isclose(got, hand, rel_tol=1e-12)


def test_flagship_step_structure():
    f = flagship_step_flops(96, (96, 96, 96), 24, 8)
    assert math.isclose(f["model_fwd_bwd"], 3 * f["model_fwd"], rel_tol=1e-12)
    assert math.isclose(f["step"], f["model_fwd_bwd"] + f["augment"], rel_tol=1e-12)
    # the model dominates; aug matmuls are a real but smaller block
    assert 0 < f["augment"] < f["model_fwd_bwd"]
    # order of magnitude: ~1.4 TF fwd at b96 (14.3 GF/sample)
    assert 1.2e12 < f["model_fwd"] < 1.6e12


def test_augment_flops_counts_spatial_subset():
    """The count credits only the round(P[any]*B) chained samples (the
    default exact-count subset gating), so batch scaling follows the
    subset-count rounding, not raw B."""
    p_any = 1.0 - 0.8**3 * 0.8  # default probs, 3D
    base = augment_flops(8, (144, 144, 144), (96, 96, 96))
    b16 = augment_flops(16, (144, 144, 144), (96, 96, 96))
    assert math.isclose(
        b16 / base, round(p_any * 16) / round(p_any * 8), rel_tol=1e-12
    )
    assert augment_flops(8, (160, 160, 160), (96, 96, 96)) > base


def test_unet_fwd_flops_no_res_units():
    plain = unet_fwd_flops((32, 32, 32), 1, 2, (8, 16), (2,), 0)

    def conv(vox, k, ci, co):
        return 2.0 * vox * k**3 * ci * co

    hand = conv(16**3, 3, 1, 8) + conv(16**3, 3, 8, 16) + conv(16**3, 3, 24, 2)
    assert math.isclose(plain, hand, rel_tol=1e-12)
