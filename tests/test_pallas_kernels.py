"""Pallas matching kernel vs the XLA reference path (interpreter mode on CPU;
the compiled path is exercised on real TPU by bench/e2e runs)."""
import numpy as np
import jax.numpy as jnp

from orb_slam2_tpu.ops import matching, pallas_kernels


class TestMaskedBestTwo:
    def _check(self, rng, n, m, density):
        a = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (m, 8), dtype=np.uint32)
        mask = rng.random((n, m)) < density
        best, idx, second = pallas_kernels.masked_best_two_pallas(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
        d = matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
        b2, i2, s2 = matching.best_two(d, jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(best), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(second), np.asarray(s2))

    def test_bit_exact_vs_xla(self, rng):
        self._check(rng, 200, 300, 0.3)

    def test_unaligned_rows(self, rng):
        self._check(rng, 130, 256, 0.5)

    def test_empty_mask_rows(self, rng):
        # rows with no candidates must give BIG like the XLA path
        a = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        mask = np.zeros((128, 128), bool)
        mask[0, 5] = True
        best, idx, second = pallas_kernels.masked_best_two_pallas(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
        assert int(best[1]) == matching.BIG
        assert int(idx[0]) == 5
        assert int(second[0]) == matching.BIG
