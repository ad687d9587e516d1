"""Bit-exactness of the fused Pallas extraction dense stage
(`ops/pallas_extract.py`) against the XLA reference path (interpret mode —
the CPU suite cannot run Mosaic natively; hardware parity is covered by the
bench/eval runs which enable cfg.use_pallas)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_tpu.ops import extractor, fast as fast_ops, image as image_ops
from orb_slam2_tpu.ops import pallas_extract, select as select_ops


def _image(rng, h, w):
    img = (rng.random((h, w)) * 255).astype(np.float32)
    # drop sharp corners on it so the FAST detector has real structure
    for _ in range(60):
        y, x = rng.integers(20, h - 20), rng.integers(20, w - 20)
        img[y:y + 6, x:x + 6] = 255.0 * rng.random()
    return jnp.asarray(img)


@pytest.mark.parametrize("h,w", [(480, 640), (231, 308), (134, 178)])
def test_dense_stage_matches_xla(h, w):
    rng = np.random.default_rng(42 + h)
    img = _image(rng, h, w)
    E = extractor.EDGE_THRESHOLD - 3
    ini, mn = 20.0, 7.0

    score = fast_ops.fast_score_map(img)
    cand, cand_score = fast_ops.compute_candidates(
        score, ini, mn, E, w - E, E, h - E)
    blur = image_ops.gaussian_blur(img)

    s_nms, hi, blur_p = pallas_extract.dense_stage_pallas(
        img, ini, mn, E, w - E, E, h - E, interpret=True)
    cand_score_p = pallas_extract.candidates_from_dense(
        s_nms, hi, E, w - E, E, h - E)

    np.testing.assert_array_equal(np.asarray(cand_score_p),
                                  np.asarray(cand_score))
    # blur differs only by FMA-contraction rounding (measured <= 5e-5 gray
    # levels — far below the BRIEF pairwise-comparison noise floor)
    np.testing.assert_allclose(np.asarray(blur_p), np.asarray(blur),
                               atol=1e-3)


def test_extract_level_pallas_end_to_end():
    rng = np.random.default_rng(7)
    img = _image(rng, 240, 320)
    ref = extractor.extract_level(img, 120, 20.0, 7.0)
    got = extractor.extract_level(img, 120, 20.0, 7.0,
                                  use_pallas=True, interpret=True)
    for name, a, b in zip(("ys", "xs", "resp", "valid", "angle"),
                          ref[:5], got[:5]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    # descriptors: the blur's FMA-rounding (<=5e-5 gray) can flip a BRIEF
    # bit only where a pattern pair compares within that margin — allow a
    # handful of flipped bits across the whole set
    xor = np.asarray(ref[5]) ^ np.asarray(got[5])
    flips = sum(bin(int(v)).count("1") for v in xor.reshape(-1))
    assert flips <= 8, f"{flips} descriptor bits flipped"


def test_pyramid_cascade_matches_resize():
    """Fused cascade (bf16-in/f32-acc MXU matmuls) vs the exact f32 XLA
    resizes: bf16 rounds the interpolation weights, bounded well under a
    gray level — far below the FAST thresholds (7..20)."""
    from orb_slam2_tpu.utils.config import SlamConfig
    from orb_slam2_tpu.ops import pallas_extract
    rng = np.random.default_rng(3)
    img = jnp.asarray((rng.random((480, 640)) * 255).astype(np.float32))
    cfg = SlamConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                     width=640, height=480, bf=100.0, fps=30.0,
                     n_features=1000)
    from orb_slam2_tpu.ops import image as image_ops
    ref = extractor.build_pyramid(img, cfg)          # f32 exact on CPU
    sizes = extractor.pyramid_sizes(480, 640, cfg.n_levels, cfg.scale_factor)
    fast = [img]                                     # the bf16 XLA fast path
    for lvl in range(1, cfg.n_levels):
        h, w = sizes[lvl]
        fast.append(image_ops.resize_bilinear(fast[-1], h, w, fast=True))
    got = pallas_extract.pyramid_pallas(img, cfg, interpret=True)
    assert len(ref) == len(got)
    for lvl, (a, af, b) in enumerate(zip(ref, fast, got)):
        assert a.shape == b.shape, (lvl, a.shape, b.shape)
        # vs the bf16 XLA cascade it replaces: same rounding contract
        df = np.abs(np.asarray(b) - np.asarray(af))
        assert df.max() <= 1.5, f"level {lvl}: max-vs-fast {df.max():.2f}"
        # sanity vs exact f32: bounded far below the FAST thresholds
        d = np.abs(np.asarray(b) - np.asarray(a))
        assert d.max() <= 5.0, f"level {lvl}: max {d.max():.2f}"
        assert d.mean() <= 0.5, f"level {lvl}: mean {d.mean():.3f}"


def test_brief_sampler_bit_exact():
    """The one-hot fp32 selection must reproduce the flat-take samples
    bit-exactly (single nonzero term per output => no rounding)."""
    from orb_slam2_tpu.ops import pallas_extract
    rng = np.random.default_rng(11)
    for h, w in ((480, 640), (134, 178)):
        img = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
        n = 117
        ys = jnp.asarray(rng.integers(19, h - 19, n), jnp.int32)
        xs = jnp.asarray(rng.integers(19, w - 19, n), jnp.int32)
        dx = jnp.asarray(rng.integers(-19, 20, (n, 512)), jnp.int32)
        dy = jnp.asarray(rng.integers(-19, 20, (n, 512)), jnp.int32)
        ref = np.asarray(img)[np.clip(np.asarray(ys)[:, None] + dy, 0, h - 1),
                              np.clip(np.asarray(xs)[:, None] + dx, 0, w - 1)]
        got = pallas_extract.brief_sample_pallas(img, ys, xs, dx, dy,
                                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_steered_brief_pallas_matches():
    from orb_slam2_tpu.ops import orient_brief, image as image_ops
    rng = np.random.default_rng(5)
    img = jnp.asarray(_image(rng, 240, 320))
    blur = image_ops.gaussian_blur(img)
    n = 96
    ys = jnp.asarray(rng.integers(19, 240 - 19, n), jnp.int32)
    xs = jnp.asarray(rng.integers(19, 320 - 19, n), jnp.int32)
    ang = jnp.asarray(rng.random(n) * 360, jnp.float32)
    ref = orient_brief.steered_brief(blur, ys, xs, ang)
    got = orient_brief.steered_brief(blur, ys, xs, ang, use_pallas=True,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
