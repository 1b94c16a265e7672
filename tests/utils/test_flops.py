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


def test_segresnet_fwd_matches_hand_count():
    """Pin the SegResNet bench configuration (96^3, 1->8, init_filters 8)
    against an independent layer-by-layer derivation."""
    from segmantic_tpu.utils.flops import segresnet_fwd_flops

    got = segresnet_fwd_flops((96, 96, 96), 1, 8)

    def conv(vox, k, ci, co):
        return 2.0 * vox * k**3 * ci * co

    v = [96**3, 48**3, 24**3, 12**3]
    hand = conv(v[0], 3, 1, 8)  # conv_init
    for i, n_blocks in enumerate((1, 2, 2, 4)):
        feats = 8 * 2**i
        if i > 0:
            hand += conv(v[i], 3, feats // 2, feats)
        hand += n_blocks * 2 * conv(v[i], 3, feats, feats)
    for j in range(3):
        i = 3 - j
        feats = 8 * 2 ** (i - 1)
        hand += conv(v[i], 1, feats * 2, feats)  # channel-halving 1^3
        hand += conv(v[i], 3, feats, feats)  # k3 s2 convT (input voxels)
        hand += 2 * conv(v[i - 1], 3, feats, feats)  # one res block
    hand += conv(v[0], 1, 8, 8)  # head
    assert math.isclose(got, hand, rel_tol=1e-12)


def test_unetr_vit_gemm_count():
    """The ViT body GEMMs at the bench shape (96^3 / patch 16 -> 216
    tokens, hidden 768, 12 layers, MLP 3072), derived independently."""
    from segmantic_tpu.utils.flops import unetr_fwd_flops

    T, H, M, L = 216, 768, 3072, 12
    vit = L * (4 * 2.0 * T * H * H + 2 * 2.0 * T * T * H + 2 * 2.0 * T * H * M)
    embed = 2.0 * T * 16**3 * 1 * H

    def conv(vox, k, ci, co):
        return 2.0 * vox * k**3 * ci * co

    def deconv(vox_in, ci, co):
        return 2.0 * vox_in * 8 * ci * co

    v = [96**3, 48**3, 24**3, 12**3, 6**3]
    f = 16
    hand = embed + vit
    hand += conv(v[0], 3, 1, f) + conv(v[0], 3, f, f)  # enc1
    for n_up, feats in ((3, 2 * f), (2, 4 * f), (1, 8 * f)):
        lvl, ci = 4, H
        for _ in range(n_up):
            hand += deconv(v[lvl], ci, feats)
            lvl -= 1
            hand += conv(v[lvl], 3, feats, feats) + conv(v[lvl], 3, feats, feats)
            ci = feats
    ci = H
    for lvl_in, feats in ((4, 8 * f), (3, 4 * f), (2, 2 * f), (1, f)):
        hand += deconv(v[lvl_in], ci, feats)
        hand += conv(v[lvl_in - 1], 3, feats + feats, feats)
        hand += conv(v[lvl_in - 1], 3, feats, feats)
        ci = feats
    hand += conv(v[0], 1, f, 8)  # head
    got = unetr_fwd_flops((96, 96, 96), 1, 8)
    assert math.isclose(got, hand, rel_tol=1e-12)


def test_step_flops_arch_dispatch():
    from segmantic_tpu.utils.flops import (
        flagship_step_flops,
        segresnet_fwd_flops,
        unetr_fwd_flops,
    )

    for arch, fn in (("segresnet", segresnet_fwd_flops),
                     ("unetr", unetr_fwd_flops)):
        f = flagship_step_flops(8, (96, 96, 96), 24, 8, arch=arch)
        assert math.isclose(f["model_fwd"], 8 * fn((96, 96, 96), 1, 8),
                            rel_tol=1e-12)
        assert math.isclose(f["step"], f["model_fwd_bwd"] + f["augment"],
                            rel_tol=1e-12)


def test_augment_flops_respects_cfg():
    """The subset-count scaling follows the config the bench passes, not
    module defaults (ADVICE r4)."""
    from segmantic_tpu.train.augment import AugmentConfig

    full = augment_flops(
        8, (144,) * 3, (96,) * 3,
        aug_cfg=AugmentConfig(spatial_subset=False),
    )
    sub = augment_flops(8, (144,) * 3, (96,) * 3, aug_cfg=AugmentConfig())
    p_any = 1.0 - 0.8**3 * 0.8
    assert math.isclose(sub / full, round(p_any * 8) / 8, rel_tol=1e-12)
