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
